"""Forward vs backward cost of the channel-major and slot-major 3^3
brick convs at production group shapes.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_sm_bwd.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bricks", type=int, default=36864)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--chans", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.models import sb_network as sbn
    from linr_pcgc_tpu.ops.superbricks import B4_SLOTS

    bb, s, c = args.bricks, args.stages, args.chans
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    nbr = np.arange(bb, dtype=np.int32)[:, None].repeat(27, 1)
    nbr[:, :13] = np.maximum(nbr[:, :13] - 1, 0)
    x_cm = jnp.asarray(rng.standard_normal((bb, s, c, B4_SLOTS)), dt)
    x_sm = jnp.asarray(
        np.swapaxes(np.asarray(x_cm, np.float32), 2, 3).reshape(bb, s, -1), dt
    )
    w = jnp.asarray(rng.standard_normal((s, 27, c, c)) * 0.1, jnp.float32)
    b = jnp.zeros((s, c), jnp.float32)
    mask = jnp.ones((bb, 1, 1, B4_SLOTS), dt)
    geom = dict(nbr27=jnp.asarray(nbr), mask=mask, dtype=dt)

    def chain_cm(x, nb):
        g = dict(geom, nbr27=nb)
        def body(h, _):
            return sbn.b4conv3(h, g, w, b), None
        return lax.scan(body, x, None, length=args.reps)[0]

    def chain_sm(x, nb):
        g = dict(geom, nbr27=nb)
        def body(h, _):
            return sbn.b4conv3_sm(h, g, w, b), None
        return lax.scan(body, x, None, length=args.reps)[0]

    def loss_cm(x, nb):
        return jnp.sum(chain_cm(x, nb).astype(jnp.float32))

    def loss_sm(x, nb):
        return jnp.sum(chain_sm(x, nb).astype(jnp.float32))

    probes = {
        "fwd_cm": jax.jit(lambda x, nb: chain_cm(x, nb)),
        "fwd_sm": jax.jit(lambda x, nb: chain_sm(x, nb)),
        "vg_cm": jax.jit(lambda x, nb: jax.value_and_grad(loss_cm)(x, nb)),
        "vg_sm": jax.jit(lambda x, nb: jax.value_and_grad(loss_sm)(x, nb)),
    }

    def sync(o):
        leaves = jax.tree_util.tree_leaves(o)
        np.asarray(jnp.ravel(leaves[0])[:1])

    nbr_d = jnp.asarray(nbr)
    for name, fn in probes.items():
        xin = x_cm if name.endswith("cm") else x_sm
        out = fn(xin, nbr_d)
        sync(out)
        t0 = time.time()
        for _ in range(3):
            out = fn(xin, nbr_d)
            sync(out)
        dt_ms = (time.time() - t0) / 3 / args.reps * 1000
        print(f"{name}: {dt_ms:.2f} ms/conv (chain of {args.reps})")


if __name__ == "__main__":
    main()
