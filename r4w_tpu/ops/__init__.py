from r4w_tpu.ops import coding

__all__ = ["coding"]
