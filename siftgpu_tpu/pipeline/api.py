"""Class-based public API mirroring the reference's `SiftGPU` / `SiftMatchGPU`
façades (SURVEY.md §2.1 rows "Public API & flag parsing" and "GLSL matcher" ⚠).

Method-name parity map (canonical `src/SiftGPU/SiftGPU.h` ⚠):
  SiftGPU::ParseParam            -> SiftTPU.parse_param (same flag names, §5.6)
  SiftGPU::CreateContextGL       -> SiftTPU.create_context (jit warm-up; no GL)
  SiftGPU::VerifyContextGL       -> SiftTPU.verify_context
  SiftGPU::RunSIFT(file|data)    -> SiftTPU.run_sift
  SiftGPU::GetFeatureNum         -> SiftTPU.get_feature_num
  SiftGPU::GetFeatureVector      -> SiftTPU.get_feature_vector
  SiftGPU::SetKeypointList       -> SiftTPU.set_keypoint_list (descriptor-only)
  SiftGPU::SaveSIFT              -> SiftTPU.save_sift
  SiftMatchGPU::SetMaxSift       -> SiftMatchTPU(max_sift=...)
  SiftMatchGPU::SetDescriptors   -> SiftMatchTPU.set_descriptors
  SiftMatchGPU::SetFeautreLocation-> SiftMatchTPU.set_feature_location [sic ⚠]
  SiftMatchGPU::GetSiftMatch     -> SiftMatchTPU.get_sift_match
  SiftMatchGPU::GetGuidedSiftMatch-> SiftMatchTPU.get_guided_sift_match
  CreateNewSiftGPU / CreateNewSiftMatchGPU -> module-level factory functions

Unlike the reference there is NO ambient global state: each instance owns a
frozen config; "context creation" is jit compilation (§3.3's shader-compile
analog).  The stateful buffer-reuse model (run once, query getters) is kept
for drop-in familiarity; new code should prefer the functional API
(`siftgpu_tpu.extract_features` etc.).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.config import MatchConfig, SiftConfig
from ..core.flags import parse_flags
from . import siftio

__all__ = [
    "SIFTGPU_FULL_SUPPORTED", "SIFTGPU_NOT_SUPPORTED",
    "SiftTPU", "SiftMatchTPU", "ComboSiftTPU",
    "create_new_sift_tpu", "create_new_sift_match_tpu",
]

SIFTGPU_FULL_SUPPORTED = 2   # VerifyContextGL return codes ⚠
SIFTGPU_NOT_SUPPORTED = 0


class SiftTPU:
    """Stateful façade over the functional extraction pipeline."""

    def __init__(self, argv: Optional[Sequence[str]] = None, **config_kw):
        self._overrides = dict(config_kw)
        self._cfg: Optional[SiftConfig] = None
        self._feats = None
        self._image = None
        self._keypoint_list = None
        self._list_iter = None
        self._run_index = 0
        if argv:
            self.parse_param(argv)

    # -- configuration ----------------------------------------------------
    def parse_param(self, argv: Sequence[str]) -> None:
        """Reference-flag-compatible parser (-fo, -d, -t, -e, -m, -s, ...)."""
        new = parse_flags(argv)
        self._overrides.update(new)
        self._cfg = None  # force re-derive on next run
        if "_image_list" in new:
            self._list_iter = None  # restart the -il list

    def config_for(self, height: int, width: int) -> SiftConfig:
        kw = {k: v for k, v in self._overrides.items() if not k.startswith("_")}
        maxd = kw.pop("max_dim", 0)
        if maxd:
            while max(height, width) > maxd:
                height //= 2
                width //= 2
        return SiftConfig(height=height, width=width, **kw)

    # -- context (jit) ----------------------------------------------------
    def create_context(self) -> int:
        """The CreateContextGL analog: verify a device exists; with `-p WxH`
        also pre-compile the extraction program for that size (the
        reference's pyramid pre-allocation ⚠)."""
        import jax

        if not jax.devices():
            return SIFTGPU_NOT_SUPPORTED
        pre = self._overrides.get("_prealloc")
        if pre:
            import jax.numpy as jnp

            from ..frontend.extract import extract_features_jit

            h, w = pre
            cfg = self.config_for(h, w)
            extract_features_jit(jnp.zeros((1, cfg.height, cfg.width)), cfg)
        return SIFTGPU_FULL_SUPPORTED

    verify_context = create_context

    def _next_listed_image(self):
        """`-il` parity ⚠: RunSIFT() with no argument consumes the next path
        from the image-list file."""
        if self._list_iter is None:
            path = self._overrides.get("_image_list")
            if not path:
                raise ValueError("run_sift() without an image needs -il <list>")
            with open(path) as f:
                entries = [ln.strip() for ln in f if ln.strip()]
            self._list_iter = iter(entries)
        return next(self._list_iter, None)

    # -- extraction -------------------------------------------------------
    def run_sift(self, image=None, *_ignored) -> bool:
        """image: path to an image file, or [H, W] (grayscale) / [H, W, 3]
        (RGB, converted with the reference's luminance weights) array; None
        consumes the next entry of the `-il` image list (returns False when
        the list is exhausted, like the reference ⚠)."""
        import jax.numpy as jnp

        from ..core import image as imio
        from ..frontend.extract import extract_features_jit

        if image is None:
            image = self._next_listed_image()
            if image is None:
                return False
        if isinstance(image, (str, bytes)):
            arr = imio.load_image(image)
        else:
            arr = imio.to_grayscale(np.asarray(image))
        maxd = self._overrides.get("max_dim", 0)
        if maxd:
            arr = imio.downsample_to_fit(arr, maxd)
        self._image = arr
        cfg = self.config_for(*arr.shape)
        self._cfg = cfg
        verbose = int(self._overrides.get("_verbose", 0))
        import time as _time

        t0 = _time.perf_counter()
        if cfg.process_obo:  # -obo: memory-capped octave-by-octave dispatches
            from ..frontend.extract import extract_features_obo

            self._feats = extract_features_obo(jnp.asarray(arr[None]), cfg)
        else:
            self._feats = extract_features_jit(jnp.asarray(arr[None]), cfg)
        if verbose >= 1:  # reference -v 1: totals (SURVEY §5.5 ⚠)
            n = int(np.asarray(self._feats.count)[0])  # forces device sync
            print(f"#features: {n}  time: {(_time.perf_counter() - t0) * 1e3:.1f} ms")
        if verbose >= 2:  # -v 2+: per-stage table (separate stage jits)
            from . import profile as _profile

            times = _profile.profile_extraction(
                jnp.asarray(arr[None]), cfg, iters=1, match_pairs=False
            )
            print(_profile.format_stage_table(times, batch=1))
        out_path = self._overrides.get("_output_file")
        if out_path:
            # `-o` parity ⚠: the reference saves after every RunSIFT; for -il
            # runs past the first, suffix the path so files are not clobbered
            self.save_sift(out_path if self._run_index == 0
                           else f"{out_path}.{self._run_index}")
        self._run_index += 1
        return True

    def get_feature_num(self) -> int:
        if self._feats is None:
            return 0
        return int(np.asarray(self._feats.count)[0])

    def get_feature_vector(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (keys [N, 4] float32 (x, y, sigma, theta), desc [N, 128]
        uint8) for valid keypoints — the reference's two-output download ⚠."""
        if self._feats is None:
            return np.zeros((0, 4), np.float32), np.zeros((0, 128), np.uint8)
        m = np.asarray(self._feats.mask[0])
        keys = np.asarray(self._feats.keypoints[0])[m]
        desc = np.asarray(self._feats.desc[0])[m]
        return keys.astype(np.float32), desc

    def set_keypoint_list(self, keys: np.ndarray) -> None:
        """Descriptor-only mode: subsequent run_sift computes descriptors at
        the given (x, y, sigma, theta) keypoints (SetKeypointList analog ⚠)."""
        self._keypoint_list = np.asarray(keys, np.float32)

    def run_sift_with_keypoints(self, image) -> bool:
        """RunSIFT with a preset keypoint list (descriptor-only mode)."""
        import jax.numpy as jnp

        from ..core import image as imio
        from ..frontend.redetect import describe_at_keypoints

        if self._keypoint_list is None:
            return self.run_sift(image)
        if isinstance(image, (str, bytes)):
            arr = imio.load_image(image)
        else:
            arr = imio.to_grayscale(np.asarray(image))
        cfg = self.config_for(*arr.shape)
        self._cfg = cfg
        self._feats = describe_at_keypoints(
            jnp.asarray(arr[None]), jnp.asarray(self._keypoint_list[None]), cfg
        )
        return True

    def save_sift(self, path: str, binary: Optional[bool] = None) -> None:
        keys, desc = self.get_feature_vector()
        binary = self._overrides.get("_output_binary", False) if binary is None else binary
        if binary:
            siftio.write_binary_sift(path, keys, desc)
        else:
            siftio.write_lowe_ascii(path, keys, desc)


class SiftMatchTPU:
    """SiftMatchGPU façade: set descriptors/locations once, query matches."""

    def __init__(self, max_sift: int = 4096, **match_kw):
        self.cfg = MatchConfig(max_sift=max_sift, max_match=max_sift, **match_kw)
        self._desc = [None, None]
        self._loc = [None, None]

    def set_max_sift(self, n: int) -> None:
        self.cfg = self.cfg.replace(max_sift=n, max_match=n)

    def verify_context(self) -> int:
        import jax

        return SIFTGPU_FULL_SUPPORTED if jax.devices() else SIFTGPU_NOT_SUPPORTED

    def set_descriptors(self, index: int, descriptors, num: Optional[int] = None):
        d = np.asarray(descriptors)
        if num is not None:
            d = d[:num]
        self._desc[index] = d

    def set_feature_location(self, index: int, keys) -> None:
        """keys: [N, >=2] with (x, y) in the first two columns."""
        self._loc[index] = np.asarray(keys, np.float32)[:, :2]

    # keep the reference's typo'd alias for drop-in compatibility ⚠
    SetFeautreLocation = set_feature_location

    def _padded(self, index: int):
        import jax.numpy as jnp

        d = self._desc[index]
        assert d is not None, f"descriptors {index} not set"
        n = self.cfg.max_sift
        out = np.zeros((n, d.shape[1]), d.dtype)
        out[: len(d)] = d[:n]
        mask = np.zeros(n, bool)
        mask[: min(len(d), n)] = True
        return jnp.asarray(out), jnp.asarray(mask)

    def get_sift_match(
        self, max_match: int = 4096, distmax: float = 0.7,
        ratiomax: float = 0.8, mutual_best: bool = True,
    ) -> np.ndarray:
        """Returns [M, 2] int32 index pairs (GetSiftMatch signature ⚠)."""
        from ..frontend.match import match_descriptors

        cfg = self.cfg.replace(
            dist_max=distmax, ratio_max=ratiomax, mutual_best=mutual_best
        )
        d0, m0 = self._padded(0)
        d1, m1 = self._padded(1)
        res = match_descriptors(d0, d1, m0, m1, cfg)
        c = min(int(res.count), max_match)
        return np.asarray(res.pairs)[:c]

    def get_guided_sift_match(
        self, max_match: int = 4096, H=None, F=None,
        distmax: float = 0.7, ratiomax: float = 0.8,
        hdistmax: float = 32.0, fdistmax: float = 16.0,
        mutual_best: bool = True,
    ) -> np.ndarray:
        import jax.numpy as jnp

        from ..frontend.match import guided_match_descriptors

        cfg = self.cfg.replace(
            dist_max=distmax, ratio_max=ratiomax, mutual_best=mutual_best
        )
        d0, m0 = self._padded(0)
        d1, m1 = self._padded(1)
        loc = []
        for i in (0, 1):
            l = self._loc[i]
            assert l is not None, "set_feature_location required for guided match"
            out = np.zeros((self.cfg.max_sift, 2), np.float32)
            out[: min(len(l), self.cfg.max_sift)] = l[: self.cfg.max_sift]
            loc.append(jnp.asarray(out))
        res = guided_match_descriptors(
            d0, d1, loc[0], loc[1],
            H=None if H is None else jnp.asarray(H, jnp.float32),
            F=None if F is None else jnp.asarray(F, jnp.float32),
            mask0=m0, mask1=m1,
            hdist_max=hdistmax, fdist_max=fdistmax, cfg=cfg,
        )
        c = min(int(res.count), max_match)
        return np.asarray(res.pairs)[:c]


class ComboSiftTPU:
    """`ComboSiftGPU` analog ⚠: one object owning a SiftTPU + SiftMatchTPU
    pair (the unit the reference's server proxied over TCP; here it is just
    composition — distribution is SPMD, SURVEY §5.8)."""

    def __init__(self, argv: Optional[Sequence[str]] = None, max_sift: int = 4096):
        self.sift = SiftTPU(argv=argv)
        self.matcher = SiftMatchTPU(max_sift=max_sift)

    def match_files(self, path0: str, path1: str, **match_kw):
        """Extract both images and match (the SimpleSIFT.cpp flow)."""
        self.sift.run_sift(path0)
        k0, d0 = self.sift.get_feature_vector()
        self.sift.run_sift(path1)
        k1, d1 = self.sift.get_feature_vector()
        self.matcher.set_descriptors(0, d0)
        self.matcher.set_descriptors(1, d1)
        self.matcher.set_feature_location(0, k0)
        self.matcher.set_feature_location(1, k1)
        return k0, k1, self.matcher.get_sift_match(**match_kw)


def create_new_sift_tpu(np_args: Optional[Sequence[str]] = None) -> SiftTPU:
    """`CreateNewSiftGPU` C-export analog ⚠."""
    return SiftTPU(argv=np_args)


def create_new_sift_match_tpu(max_sift: int = 4096) -> SiftMatchTPU:
    """`CreateNewSiftMatchGPU` C-export analog ⚠."""
    return SiftMatchTPU(max_sift=max_sift)
