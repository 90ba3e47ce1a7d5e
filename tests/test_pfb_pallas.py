"""Fused Pallas PFB channelizer + row resampler vs the XLA path
(interpret mode)."""
import numpy as np
import jax.numpy as jnp

from tetra_tpu.phy import pfb
from tetra_tpu.phy.channelizer import _resample_ri_one, _resample_rows_ri
from tetra_tpu.phy.pfb_pallas import (pfb_channelize_ri_pallas,
                                      pfb_channelize_rows_pallas)


class TestPfbPallas:
    def test_channelize_matches_xla(self):
        rng = np.random.default_rng(20)
        T = 300_000
        re = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        im = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        for C in (64, 512):
            r1, i1 = pfb.pfb_channelize_ri(re, im, C)
            r2, i2 = pfb_channelize_ri_pallas(re, im, C, interpret=True)
            np.testing.assert_allclose(np.asarray(r1),
                                       np.asarray(r2)[:, : r1.shape[1]],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(i1),
                                       np.asarray(i2)[:, : i1.shape[1]],
                                       atol=1e-5)

    def test_row_resampler_matches_channel_major(self):
        """_resample_rows_ri on [M, C] == _resample_ri_one on [C, M]
        (same plan, same coefficients), away from the edge-pad rows."""
        rng = np.random.default_rng(21)
        M, C = 5000, 64
        x = rng.normal(0, 1, (C, M)).astype(np.float32)
        skew = -31.99
        a = np.asarray(_resample_ri_one(jnp.asarray(x), M, 50_000.0,
                                        36_000.0, skew=skew))
        b = np.asarray(_resample_rows_ri(jnp.asarray(x.T), M, 50_000.0,
                                         36_000.0, skew=skew)).T
        assert a.shape == b.shape
        np.testing.assert_allclose(a[:, 40:-40], b[:, 40:-40], atol=1e-5)

    def test_tpu_pipeline_matches_xla_pipeline(self):
        """The time-major kernel + row resampler composition (the TPU
        route inside pfb_to_demod_rate_ri) equals the channel-major XLA
        route on a real multi-channel signal."""
        rng = np.random.default_rng(22)
        C = 64
        fs = C * 25_000.0
        T = 400_000
        re = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        im = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        idx = jnp.arange(C, dtype=jnp.int32)
        ar, ai = pfb.pfb_to_demod_rate_ri(re, im, idx, C, fs)  # XLA (CPU)
        chan_rate = 2.0 * fs / C
        skew = -(C * 16 - 1) / (2.0 * (C // 2))
        yr, yi = pfb_channelize_rows_pallas(re, im, C, interpret=True)
        br = np.asarray(_resample_rows_ri(yr, yr.shape[0], chan_rate,
                                          36_000.0, skew=skew)).T
        bi = np.asarray(_resample_rows_ri(yi, yi.shape[0], chan_rate,
                                          36_000.0, skew=skew)).T
        n = min(br.shape[1], np.asarray(ar).shape[1])
        np.testing.assert_allclose(np.asarray(ar)[:, 40:n - 40],
                                   br[:, 40:n - 40], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ai)[:, 40:n - 40],
                                   bi[:, 40:n - 40], atol=1e-4)

    def test_pallas_resampler_matches_rows(self):
        """resample_rows_pallas (interpret, f32) == _resample_rows_ri
        away from the boundary rows (zero-fill vs edge-pad)."""
        from tetra_tpu.phy.pfb_pallas import resample_rows_pallas
        rng = np.random.default_rng(23)
        M, C = 4000, 128
        x_r = jnp.asarray(rng.normal(0, 1, (M, C)).astype(np.float32))
        x_i = jnp.asarray(rng.normal(0, 1, (M, C)).astype(np.float32))
        skew = -31.99
        a_r = np.asarray(_resample_rows_ri(x_r, M, 50_000.0, 36_000.0,
                                           skew=skew))
        b_r, b_i = resample_rows_pallas(x_r, x_i, 50_000.0, 36_000.0,
                                        skew=skew, interpret=True)
        assert a_r.shape == np.asarray(b_r).shape
        np.testing.assert_allclose(a_r[40:-40], np.asarray(b_r)[40:-40],
                                   atol=1e-5)
        a_i = np.asarray(_resample_rows_ri(x_i, M, 50_000.0, 36_000.0,
                                           skew=skew))
        np.testing.assert_allclose(a_i[40:-40], np.asarray(b_i)[40:-40],
                                   atol=1e-5)
