from . import desc_sampler

__all__ = ["desc_sampler"]
