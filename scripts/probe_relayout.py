"""Which (8,128)-layout changes lower in Mosaic? Each probed in isolation."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LAN = 8, 128
BLK = SUB * LAN


def probe(name, body):
    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

    try:
        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        x = jnp.arange(BLK, dtype=jnp.float32).reshape(SUB, LAN)
        r = np.asarray(f(x))
        ok = "OK  " if np.isfinite(r).all() else "NAN "
        print(f"{ok} {name}  (sum={r.sum():.0f})")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL {name}: {type(e).__name__} {msg}")


def main():
    print(jax.devices())

    probe("reshape (8,128)->(1,1024)->back",
          lambda x: x.reshape(1, BLK).reshape(SUB, LAN))
    probe("reshape (8,128)->(1024,)->back",
          lambda x: x.reshape(BLK).reshape(SUB, LAN))
    probe("transpose (8,128)->(128,8)->back",
          lambda x: jnp.transpose(x).transpose())
    probe("reshape+transpose -> (1024,1) -> back",
          lambda x: jnp.transpose(x.reshape(1, BLK)).reshape(1, BLK).reshape(SUB, LAN))
    probe("roll sublane", lambda x: pltpu.roll(x, 1, 0))
    probe("roll lane", lambda x: pltpu.roll(x, 1, 1))

    def onehot_route(x):
        # (8,128) idx -> (1,1024) -> onehotT (R,1024) -> matmul -> back
        R = 256
        idx = (x.astype(jnp.int32) % R).reshape(1, BLK)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 0)
        onehotT = (iota_r == idx).astype(jnp.bfloat16)             # (R,1024)
        tab = (jax.lax.broadcasted_iota(jnp.int32, (8, R), 0)
               + jax.lax.broadcasted_iota(jnp.int32, (8, R), 1)).astype(jnp.bfloat16)
        out = jnp.dot(tab, onehotT, preferred_element_type=jnp.float32)  # (8,1024)
        val = out[0:1, :]                                           # (1,1024)
        return val.reshape(SUB, LAN)

    probe("one-hot gather via (R,1024) transpose-form", onehot_route)

    def onehot_sub(x):
        # 8 sub-matmuls of (128,R)x(R,W): relies on transpose (8,128)->(128,8)
        R, W = 256, 128
        idx = (x.astype(jnp.int32) % R)
        idx_t = jnp.transpose(idx)                                  # (128,8)
        tab = (jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)).astype(jnp.bfloat16)
        outs = []
        for s in range(SUB):
            col = idx_t[:, s:s + 1]                                 # (128,1)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (128, R), 1) == col
                  ).astype(jnp.bfloat16)
            rows = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            outs.append(jnp.sum(rows, axis=1, keepdims=True))       # (128,1)
        cat = jnp.concatenate(outs, axis=1)                         # (128,8)
        return jnp.transpose(cat)                                   # (8,128)

    probe("one-hot gather via 8 sub-matmuls", onehot_sub)


if __name__ == "__main__":
    main()
