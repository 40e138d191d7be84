from .direct import (
    direct_type1_np,
    direct_type2_np,
    direct_type3_jax,
    direct_type3_np,
)
from .kernels import ESKernel, es_kernel, es_kernel_ft, es_kernel_grid, next_fast_size
from .transform import (
    Type1Executor,
    Type1Plan,
    Type2Executor,
    Type2Plan,
    Type3Executor,
    Type3Plan,
    make_type1_fn,
    make_type2_fn,
    make_type3_fn,
    plan_type1,
    plan_type2,
    plan_type3,
)

__all__ = [
    "ESKernel",
    "es_kernel",
    "es_kernel_ft",
    "es_kernel_grid",
    "next_fast_size",
    "Type1Plan",
    "Type2Plan",
    "Type3Plan",
    "plan_type1",
    "plan_type2",
    "plan_type3",
    "make_type1_fn",
    "make_type2_fn",
    "make_type3_fn",
    "direct_type3_np",
    "direct_type2_np",
    "direct_type1_np",
    "direct_type3_jax",
]
