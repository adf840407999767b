import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerocaf_tpu.ops.pallas import field_kernels as fk
from zerocaf_tpu import constants as C

CL = tuple(int(v) for v in fk.FIELD.fold_c_limbs)
D2 = tuple(int(v) for v in np.asarray(C.EDWARDS_2D_LIMBS))
DL = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
B = 256
WHICH = sys.argv[1]

if WHICH == "table":
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    call = pl.pallas_call(
        functools.partial(fk._table_kernel, d2_limbs=D2, c_limbs=CL,
                          d_limbs=DL, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * 4 * 32, B), jnp.int32),
        in_specs=[pl.BlockSpec((128, B), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb * 4 * 32, B), memory_space=pltpu.VMEM))
    pt = jnp.asarray(np.random.randint(0, 4096, (128, B), dtype=np.int32))
    out = jax.jit(call)(pt)
    print("table ok", int(np.asarray(out).sum()) & 0xFFFF)
elif WHICH == "step":
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    call = pl.pallas_call(
        functools.partial(fk._step_kernel, c_limbs=CL, width=4, nb=nb),
        out_shape=jax.ShapeDtypeStruct((128, B), jnp.int32),
        in_specs=[pl.BlockSpec((128, B), memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb * 4 * 32, B), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, B), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, B), memory_space=pltpu.VMEM))
    q = jnp.asarray(np.random.randint(0, 4096, (128, B), dtype=np.int32))
    t = jnp.asarray(np.random.randint(0, 4096, (nb * 4 * 32, B), dtype=np.int32))
    d = jnp.asarray(np.random.randint(0, nb, (8, B), dtype=np.int32))
    out = jax.jit(call)(q, t, d)
    print("step ok", int(np.asarray(out).sum()) & 0xFFFF)
