import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerocaf_tpu.ops.pallas import field_kernels as fk
from zerocaf_tpu import constants as C

CL = tuple(int(v) for v in fk.FIELD.fold_c_limbs)
D2 = tuple(int(v) for v in np.asarray(C.EDWARDS_2D_LIMBS))
DL = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))

WHICH = sys.argv[1] if len(sys.argv) > 1 else "dbl"


def kern(pt_ref, out_ref):
    X = pt_ref[0:22]
    Y = pt_ref[32:54]
    Z = pt_ref[64:86]
    T = pt_ref[96:118]
    Q = (X, Y, Z, T)
    if WHICH in ("dbl", "all"):
        Q = fk._pdbl_block(Q, CL, with_t=True)
    if WHICH in ("madd", "all"):
        e = (fk._c1(Y + X), fk._c1(Y - X), Z, fk._mul_const(T, D2, CL))
        Q = fk._madd_block(Q, e, CL)
    if WHICH in ("ext", "all"):
        Q = fk._padd_ext_block(Q, (X, Y, Z, T), DL, CL)
    if WHICH == "sq":
        s = fk._sqb(X, CL)
        Q = (s, s, s, s)
    for i, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + 22] = Q[i]
        out_ref[lo + 22:lo + 32] = jnp.zeros((10, 512), jnp.int32)


@jax.jit
def run(pt):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.int32),
        in_specs=[pl.BlockSpec((128, 512), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 512), memory_space=pltpu.VMEM))(pt)


pt = jnp.asarray(np.random.randint(0, 4096, (128, 512), dtype=np.int32))
print(WHICH, "ok", int(np.asarray(run(pt)).sum()) & 0xFFFF)
