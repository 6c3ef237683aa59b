from .hat_matmul import hat_interp_matmul

__all__ = ["hat_interp_matmul"]
