"""Resampler-only microbench: block einsum precision/structure variants."""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu.phy import channelizer as ch

REPS = 7
C = 512
FS, OUT = 50_000.0, 36_000.0


def med(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def variant(precision, fuse_rows):
    plan = ch._resample_block_plan(1, FS, OUT)  # just for W shape info
    def fn(x, n_in):
        W, bmin, width, L, M, n_out, pad_l = ch._resample_block_plan(
            n_in, FS, OUT)
        nq = -(-n_out // M)
        if fuse_rows > 1:
            # fuse `fuse_rows` output blocks into one bigger matmul:
            # A [fr*M outputs, (fr-1)*L + width inputs], block stride fr*L
            fr = fuse_rows
            wid2 = (fr - 1) * L + width
            A = np.zeros((wid2, fr * M), np.float32)
            for b in range(fr):
                A[b * L: b * L + width, b * M: (b + 1) * M] = W
            nq2 = -(-nq // fr)
            need = pad_l + (nq2 - 1) * fr * L + bmin + wid2
            pad_r = max(need - pad_l - n_in, 0)
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)],
                         mode="edge")
            idx = ((jnp.arange(nq2) * (fr * L))[:, None] + (pad_l + bmin)
                   + jnp.arange(wid2)[None, :])
            blocks = xp[..., idx]
            out = jnp.einsum("...qw,wr->...qr", blocks, jnp.asarray(A),
                             preferred_element_type=jnp.float32,
                             precision=precision)
            return out.reshape(*x.shape[:-1], nq2 * fr * M)[..., :n_out]
        need = pad_l + (nq - 1) * L + bmin + width
        pad_r = max(need - pad_l - n_in, 0)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)],
                     mode="edge")
        idx = ((jnp.arange(nq) * L)[:, None] + (pad_l + bmin)
               + jnp.arange(width)[None, :])
        blocks = xp[..., idx]
        out = jnp.einsum("...qw,wr->...qr", blocks, jnp.asarray(W),
                         preferred_element_type=jnp.float32,
                         precision=precision)
        return out.reshape(*x.shape[:-1], nq * M)[..., :n_out]
    return fn


def main():
    rng = np.random.default_rng(0)
    results = {}
    cases = {
        "highest_f1": (jax.lax.Precision.HIGHEST, 1),
        "default_f1": (jax.lax.Precision.DEFAULT, 1),
        "highest_f16": (jax.lax.Precision.HIGHEST, 16),
        "default_f16": (jax.lax.Precision.DEFAULT, 16),
    }
    data = {}
    for M_in in (1 << 15, 1 << 18):
        data[M_in] = jnp.asarray(
            rng.normal(0, 1, (C, M_in)).astype(np.float32))
    ref = None
    for name, (prec, fr) in cases.items():
        fn = variant(prec, fr)
        stepped = {}
        for M_in, x in data.items():
            step = jax.jit(lambda x, n=M_in, f=fn: f(x, n).sum())
            v = float(step(x))
            stepped[M_in] = med(lambda s=step, x=x: float(s(x)))
            if name == "highest_f1" and M_in == (1 << 18):
                ref = np.asarray(jax.jit(lambda x, n=M_in, f=fn: f(x, n))(x))
            elif M_in == (1 << 18):
                got = np.asarray(jax.jit(lambda x, n=M_in, f=fn: f(x, n))(x))
                results[name + "_maxdiff"] = float(
                    np.abs(got[:, :ref.shape[1]] - ref[:, :got.shape[1]]).max())
        d = C * ((1 << 18) - (1 << 15))
        results[name + "_gs"] = round(d / (stepped[1 << 18] - stepped[1 << 15]) / 1e9, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
