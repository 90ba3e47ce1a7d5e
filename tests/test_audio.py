"""fcdp audio-card I/Q ingest end to end (SURVEY §2.8; reference
src/demod/fcdp-tetra_demod.py).

A TETRA carrier is synthesized at the fcdp's 96 kHz audio rate with a
calibration offset, rendered as the interleaved stereo PCM bytes an
`arecord` pipe would deliver (left = I, right = Q, S16_LE), and
decoded through the `--audio` receiver path: AudioPipeSource ->
channelize (mix + 25 kHz LP + polyphase resample to 36 kHz) -> demod ->
streaming burst sync -> CRC-OK blocks.
"""
import io

import numpy as np
import jax.numpy as jnp

from tetra_tpu import tx, testpdu
from tetra_tpu.io.audio import AudioPipeSource
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.phy import channelizer, dqpsk
from tetra_tpu.rx import TetraReceiver

INIT = scramb_get_init(262, 42, 1)
FS_AUDIO = 96_000.0


def _carrier_iq(n_sync=6):
    rng = np.random.default_rng(0)
    aach = testpdu.make_access_assign_bits()
    burst = np.asarray(tx.make_sync_burst(
        testpdu.make_sync_pdu(mcc=262, mnc=42, cc=1),
        testpdu.make_sysinfo_pdu(), aach, jnp.uint32(INIT)), np.int8)
    bits = np.concatenate([rng.integers(0, 2, 222).astype(np.int8)]
                          + [burst] * n_sync)
    return np.asarray(dqpsk.modulate(bits[None], sps=2))  # [1, T] @36 kHz


def _pcm_bytes(iq96, fmt="s16le", swap=False):
    i = np.real(iq96).astype(np.float32)
    q = np.imag(iq96).astype(np.float32)
    if swap:
        i, q = q, i
    inter = np.empty(2 * len(i), np.float32)
    inter[0::2], inter[1::2] = i, q
    if fmt == "s16le":
        peak = np.abs(inter).max()
        return (inter / peak * 0.8 * 32767).astype("<i2").tobytes()
    return inter.astype("<f4").tobytes()


class TestAudioSource:
    def test_pcm_roundtrip_formats(self):
        rng = np.random.default_rng(1)
        z = (rng.normal(0, 0.2, 1000)
             + 1j * rng.normal(0, 0.2, 1000)).astype(np.complex64)
        for fmt in ("s16le", "f32le"):
            src = AudioPipeSource(io.BytesIO(_pcm_bytes(z, fmt)), fmt=fmt)
            a = src.read(300)
            b = np.concatenate(list(src.stream(chunk=171)))
            got = np.concatenate([a, b])
            assert len(got) == 1000
            scale = np.abs(z).max() / np.abs(got).max()
            np.testing.assert_allclose(got * scale, z, atol=2e-2)

    def test_swap_iq(self):
        z = np.asarray([1 + 2j, -3 + 0.5j], np.complex64)
        src = AudioPipeSource(io.BytesIO(_pcm_bytes(z, "f32le", swap=True)),
                              fmt="f32le", swap_iq=True)
        np.testing.assert_allclose(src.read(2), z, atol=1e-6)

    def test_narrow_capture_scan(self):
        """The scan's narrow-capture fallback (audio-rate spans where
        the 25 kHz raster degenerates): PSD-peak offset estimate within
        ~1 kHz, then decode confirmation — the measured analogue of
        reading the calibration off fcdp-tetra_demod_fft.py's plot."""
        from tetra_tpu import scan as scanner
        iq36 = _carrier_iq(n_sync=20)
        wide = channelizer.synthesize_wideband(iq36, [25_000.0],
                                               fs=FS_AUDIO)
        results, _ = scanner.scan(wide, FS_AUDIO, confirm=True)
        assert len(results) == 1
        r = results[0]
        assert abs(r["offset_hz"] - 25_000.0) <= 1_500.0, r
        assert r["confirmed"] and r["mcc"] == 262 and r["mnc"] == 42, r

    def test_fcdp_chain_decodes(self):
        """96 kHz stereo PCM with a +5 kHz calibration offset decodes
        through the --audio path's device chain."""
        cal = 5_000.0
        iq36 = _carrier_iq()
        wide = channelizer.synthesize_wideband(iq36, [cal], fs=FS_AUDIO)
        src = AudioPipeSource(io.BytesIO(_pcm_bytes(wide)), fmt="s16le")

        rx = TetraReceiver(log=lambda *a, **k: None)
        for z in src.stream(chunk=48_000):
            re = jnp.asarray(np.real(z)[None].astype(np.float32))
            im = jnp.asarray(np.imag(z)[None].astype(np.float32))
            cr, ci = channelizer.channelize_ri(
                re[0], im[0], jnp.asarray([cal], np.float32), fs=FS_AUDIO)
            bits = np.asarray(dqpsk.demodulate_hard_ri(cr, ci, sps=2))[0]
            rx.process_bits(bits, final=False)
        rx.process_bits(np.zeros(0, np.uint8), final=True)
        assert rx.stats.crc_ok >= 8, (rx.stats.crc_ok, rx.stats.crc_wrong)
        assert rx.mcc == 262 and rx.mnc == 42
