"""End-to-end MultiCarrierReceiver benchmark: N carriers of raw hard
bits (acquisition from garbage, steady slots, mixed SYNC/SCH_F
traffic) through sync_vec + fused FEC + the native control plane, as
one receiver object processing chunked input — the integration-level
number, not a kernel number. Prints one JSON line.

Usage: python tools/bench_mc_e2e.py [n_carriers] [n_frames] [chunks]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import os

import numpy as np
import jax
if not (os.environ.get("PYTEST_CURRENT_TEST")
        or os.environ.get("TETRA_TPU_TESTS")):
    # bench runs want every compile cached (TPU compiles through the
    # tunnel cost 30-120 s); the TEST suite must NOT re-enable the
    # cache when it imports this module — the executable serialization
    # path segfaults late in a full-suite run (tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tetra_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init, scramb_bits
from tetra_tpu.rx_multi import MultiCarrierReceiver

INIT = scramb_get_init(262, 42, 1)
BITRATE = 36_000.0  # bits/s per carrier: real-time reference

MCC, MNC, CC = 262, 42, 1
SCK = bytes(range(0xA0, 0xAA))
CCK_ID = 7
KEYSTORE = (f"network mcc {MCC} mnc {MNC} ksg_type 1 security_class 2\n"
            f"key mcc {MCC} mnc {MNC} addr 0 key_type 1 key_num {CCK_ID} "
            f"key {SCK.hex().upper()}\n")


HEAD_NOISE = 731


def timed_passes(one_pass, reps=3):
    """Warm until stable, then time: the first warm pass pays compiles,
    but the NEXT few passes still ramp (~35% measured on this rig —
    device clocks / allocator / cache effects fade over several
    passes, so a single warm pass leaves the first e2e stage of a
    process systematically slow). Warm passes repeat (max 4) until the
    pass time stops improving by >10%, then `reps` timed passes.
    Returns (mc, stats, median wall)."""
    t_prev = None
    for _ in range(4):
        t0 = time.perf_counter()
        mc, stats = one_pass()
        t = time.perf_counter() - t0
        if t_prev is not None and t > 0.9 * t_prev:
            break
        t_prev = t
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mc, stats = one_pass()
        samples.append(time.perf_counter() - t0)
    return mc, stats, float(np.median(samples))


def common_len(n_frames):
    """Shared per-carrier capture length across ALL e2e stages: the
    mixed stream's natural length (the longest fixture: head noise +
    double-SYNC + n_frames frames + relock noise) plus a wide noise
    tail, rounded even. Every stage pads its rows to this length with
    circular_safe_pad, so the fused-chunk programs compile ONCE on the
    rig and per-carrier circular rolls never truncate a burst. The
    tail is wide (~3 kbit) so safe_rolls has a big window to spread
    carrier content shifts over (composite Gaussianity)."""
    L = HEAD_NOISE + 510 + n_frames * 2040 + 443 + 2921
    return L + (L % 2)


def safe_rolls(n_car, L, n_tail, head=HEAD_NOISE, guard=64):
    """Per-carrier circular roll offsets whose START position lands in
    the capture's screened noise (tail span or head span).

    The receiver then begins UNLOCKED in noise, acquires on the
    double-SYNC head (first SYNC consumed by acquisition — the
    reference skips the acquisition burst, tetra_burst_sync.c:80-91 —
    the second SYNC decodes SB1 and sets the cell scrambling code
    before any normal burst), and the stream END falls in noise too.
    An arbitrary roll would cold-start the receiver mid-frame: up to 3
    slots decode before any SB1 sets the scrambling code, and whether
    those garbage decodes count CRC-wrong depends on what the
    garbage-descrambled AACH happens to say — reference-faithful, but
    a nondeterministic invariant for a 0-CRC-error capture."""
    W = n_tail + head - 2 * guard
    start0 = L - n_tail + guard
    pos = (start0 + (np.arange(n_car, dtype=np.int64) * 997
                     + np.arange(n_car) % 17) % W)
    return (L - pos % L) % L


def make_stream(rng, n_frames):
    """One carrier's bit stream: garbage, a double-SYNC head
    (acquisition consumes the first SYNC — tetra_burst_sync.c:80-91 —
    the second decodes SB1 so the cell scrambling code is set before
    the first normal burst), then n_frames TDMA frames of
    [SYNC, SCH_F, SCH_F, SCH_F] bursts."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sync = np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(mcc=262, mnc=42, cc=1),
            testpdu.make_sysinfo_pdu(),
            testpdu.make_access_assign_bits(), jnp.uint32(INIT)), np.uint8)
        schf = [np.asarray(tx.make_schf_burst(
            testpdu.make_resource_pdu(ssi=0x400 + i),
            testpdu.make_access_assign_bits(), jnp.uint32(INIT)), np.uint8)
            for i in range(4)]
    frames = [sync]
    for f in range(n_frames):
        frames.append(sync)
        for tn in range(3):
            frames.append(schf[(f + tn) % 4])
    return np.concatenate([rng.integers(0, 2, HEAD_NOISE).astype(np.uint8)]
                          + frames)


def circular_safe_pad(row, rng, n_tail=737):
    """Append a clean-noise tail (even total length) and verify the
    CIRCULAR junction regions contain no training-sequence match, so
    the per-carrier circular rolls the multi-carrier fixtures apply
    never cut a burst mid-slot or fabricate a false lock:

    * without a tail the stream ends ON a burst boundary, and any roll
      that truncates the stream (or an even-length trim) cuts that
      final burst — a locked receiver then matches the training
      sequence of the half-present burst and emits a garbage slot
      (CRC wrong), which is exactly the mixed/wideband bench's failure
      mode before this pad;
    * with the tail, the roll junction is noise -> head-noise, i.e. a
      plain relock the capture already exercises.

    Checked spans: the tail itself, the last-burst -> tail crossing,
    and the tail-end -> stream-head circular crossing."""
    from tetra_tpu.phy.sync import compute_match_map
    if (len(row) + n_tail) % 2:
        n_tail += 1
    while True:
        tail = rng.integers(0, 2, n_tail).astype(np.uint8)
        cross_in = np.concatenate([row[-48:], tail[:48]])
        cross_junc = np.concatenate([tail[-48:], row[:48]])
        if not (compute_match_map(tail).any()
                or compute_match_map(cross_in).any()
                or compute_match_map(cross_junc).any()):
            return np.concatenate([row, tail])


def _encrypt_pdu(pdu, tn, fn, mn, skip=0, end=None):
    """Set encryption_mode=1 and XOR the ciphertext range with the
    keystream the RX will derive at the slot's TDMA time (TX mirror of
    reference tetra_crypto.c:158-252; SYSINFO advertises CCK_ID so the
    SCK above is selected, hn stays -1)."""
    from tetra_tpu.umac import mac_pdu
    from tetra_tpu.crypto.crypto import (CryptoState, TetraKey,
                                         TetraNetinfo, generate_keystream)
    from tetra_tpu.tdma import TdmaTime
    pdu = np.array(pdu)
    pdu[4:6] = [0, 1]
    off = mac_pdu.decode_resource(pdu).bit_len
    if end is None:
        end = mac_pdu.decode_resource(pdu).macpdu_length * 8
    ni = TetraNetinfo(mcc=MCC, mnc=MNC, ksg_type=1, security_class=2)
    key = TetraKey(index=0, mcc=MCC, mnc=MNC, key_type=1, key_num=CCK_ID,
                   addr=0, key=SCK, network_info=ni)
    tcs = CryptoState(mcc=MCC, mnc=MNC, cc=CC, cn=3710, la=1234, hn=-1)
    ks = generate_keystream(tcs, key, TdmaTime(tn=tn, fn=fn, mn=mn),
                            skip + (end - off))
    pdu[off:end] ^= ks[skip:]
    return pdu.astype(np.int8)


def _start_frag(ssi, sdu, total_len=268):
    """MAC-RESOURCE with length 0x3F (start of fragmentation)."""
    b = (testpdu.BitBuilder().u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1)
         .u(0x3F, 6).u(1, 3).u(ssi, 24).u(0, 1).u(0, 1).u(0, 1).raw(sdu))
    return b.pad_to(total_len, 0).array(total_len)


def _mac_end(sdu, total_len=268):
    """MAC-END carrying the final fragment + a null PDU terminator."""
    li = -(-(2 + 1 + 1 + 1 + 6 + 1 + 1 + len(sdu)) // 8)
    b = (testpdu.BitBuilder().u(1, 2).u(1, 1).u(0, 1).u(0, 1).u(li, 6)
         .u(0, 1).u(0, 1).raw(sdu).pad_to(li * 8, 0)
         .u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1).u(0, 6).u(0, 3))
    return b.pad_to(total_len, 0).array(total_len)


def _null_schf(total_len=268):
    return (testpdu.BitBuilder().u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1)
            .u(0, 6).u(0, 3).pad_to(total_len, 0).array(total_len))


def _stolen_marker(ssi, sdu, total_len=124):
    """RESOURCE with length 0x3E: this STCH block fills the half slot
    and announces the second block is ALSO stolen."""
    b = (testpdu.BitBuilder().u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1)
         .u(0x3E, 6).u(1, 3).u(ssi, 24).u(0, 1).u(0, 1).u(0, 1).raw(sdu))
    return b.pad_to(total_len, 0).array(total_len)


def make_mixed_stream(rng, n_frames, encrypted=False):
    """One carrier's FULL-protocol-mix stream: SYNC + SCH/F resources
    with LLC payloads, NDB/SCH_HD half-slot pairs, FRAG-START/MAC-END
    chains, traffic+voice slots (full-slot and NDB half-slot), fully
    stolen STCH slots, a forced mid-stream relock, frame-18 AACH
    windows, and (encrypted=True) TEA1-encrypted RESOURCEs incl. a
    216-bit-skip second half slot — the workload class of reference
    tetra_lower_mac.c:178-352 instead of a sanitized SYNC/SCH_F mix."""
    from tetra_tpu.phy.sync import compute_match_map

    def clean_noise(n):
        # noise span with NO accidental training-sequence match: a
        # false lock during (re)acquisition would emit one garbage
        # slot (CRC wrong) and break the capture's 0-error invariant
        while True:
            cand = rng.integers(0, 2, n).astype(np.uint8)
            if not compute_match_map(cand).any():
                return cand

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        aach = testpdu.make_access_assign_bits()
        aach_t = testpdu.make_access_assign_bits(hdr=3, f1=5, f2=0)
        si = (testpdu.make_sysinfo_pdu(cck_id=CCK_ID) if encrypted
              else testpdu.make_sysinfo_pdu(hyperframe=99))
        bb_t = np.asarray(tx.encode_bbk(jnp.asarray(aach_t),
                                        jnp.uint32(INIT)))
        dsetup = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        big_tl = np.concatenate(
            [testpdu.make_mle_cmce_dsetup(),
             np.tile([1, 0, 1, 1, 0, 0], 40)]).astype(np.int8)
        big_llc = testpdu.make_bl_udata(big_tl)

        def sb(fn):
            return np.asarray(tx.make_sync_burst(
                testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, tn=1,
                                      fn=fn, mn=1),
                si, aach, jnp.uint32(INIT)), np.uint8)

        def schf(pdu, traffic=False):
            return np.asarray(tx.make_schf_burst(
                pdu, aach_t if traffic else aach,
                jnp.uint32(INIT)), np.uint8)

        def ndb(b1, b2, traffic=False):
            return np.asarray(tx.make_ndb_burst(
                b1, b2, aach_t if traffic else aach,
                jnp.uint32(INIT)), np.uint8)

        from tetra_tpu.phy.burst import build_norm_c_d_burst

        def voice():
            t5 = np.asarray(scramb_bits(
                jnp.uint32(INIT),
                jnp.asarray(rng.integers(0, 2, 432).astype(np.int8))))
            return np.asarray(build_norm_c_d_burst(
                t5[:216], bb_t, t5[216:], False), np.uint8)

        def ndb_half_voice(b1_pdu):
            # STCH signalling in block 1 (auto-stolen on a traffic
            # slot), raw half-slot voice in block 2
            b1 = np.asarray(tx.encode_block("NDB", jnp.asarray(b1_pdu),
                                            jnp.uint32(INIT)))
            t5 = np.asarray(scramb_bits(
                jnp.uint32(INIT),
                jnp.asarray(rng.integers(0, 2, 216).astype(np.int8))))
            return np.asarray(build_norm_c_d_burst(b1, bb_t, t5, True),
                              np.uint8)

        res = lambda ssi, sdu=dsetup, tl=268: testpdu.make_resource_pdu(
            ssi=ssi, sdu_bits=sdu, total_len=tl)
        frag1 = _start_frag(0x777, big_llc[: 268 - 43])
        frag2 = _mac_end(big_llc[268 - 43:])

        # double-SYNC head: alignment consumes the first burst, the
        # second decodes SB1 so the cell scrambling code is known
        # before the first pattern frame's NDB/stolen slots
        parts = [clean_noise(731), sb(1)]
        for f in range(n_frames):
            fn = f % 18 + 1
            parts.append(sb(fn))
            p = f % 4
            if p == 0:
                if encrypted:
                    e = lambda tn, tl=268, skip=0, end=None: _encrypt_pdu(
                        res(0x900 + f, tl=tl), tn, fn, 1, skip, end)
                    parts += [schf(e(2)),
                              ndb(e(3, tl=124),
                                  _encrypt_pdu(res(0x90F, tl=124), 3, fn,
                                               1, skip=216)),
                              schf(e(4))]
                else:
                    parts += [schf(res(0x400 + f)),
                              ndb(res(0x500 + f, tl=124),
                                  res(0x501 + f, tl=124)),
                              schf(res(0x402 + f))]
            elif p == 1:
                # FRAG-START at tn=2; END lands on the same TN next frame
                parts += [schf(frag1), schf(_null_schf()),
                          schf(_null_schf())]
            elif p == 2:
                parts += [schf(frag2), voice(),
                          ndb(_stolen_marker(0x600 + f, dsetup),
                              res(0x601 + f, tl=124), traffic=True)]
            else:
                parts += [schf(res(0x700 + f)),
                          ndb_half_voice(res(0x702 + f, tl=124)),
                          voice()]
            if f == n_frames // 2:
                # lock loss + re-acquisition mid-stream
                parts.append(clean_noise(443))
    return np.concatenate(parts)


def run(n_car=1024, n_frames=8, n_chunks=4):
    """One timed end-to-end pass; returns the result dict (also used by
    bench.py for the headline integrated number)."""
    rng = np.random.default_rng(0)
    row = make_stream(rng, n_frames)
    n_tail = common_len(n_frames) - len(row)
    row = circular_safe_pad(row, rng, n_tail)
    bits = np.tile(row, (n_car, 1))
    # stagger carriers so lock offsets differ (every start lands in
    # screened noise — see safe_rolls)
    rolls = safe_rolls(n_car, bits.shape[1], n_tail)
    for c in range(n_car):
        bits[c] = np.roll(bits[c], rolls[c])
    T = bits.shape[1]
    cuts = np.linspace(0, T, n_chunks + 1).astype(int)

    def one_pass():
        mc = MultiCarrierReceiver(np.zeros(n_car), fs=25_000.0 * n_car,
                                  control_plane="native")
        for k in range(n_chunks):
            # streaming contract: mid-stream chunks keep one chunk in
            # flight (fetch+walk of chunk k overlaps device compute of
            # chunk k+1); the final call drains the pipeline
            stats = mc.process_bits(bits[:, cuts[k]:cuts[k + 1]],
                                    final=k == n_chunks - 1)
        return mc, stats

    # warm-until-stable + median of 3 timed passes (timed_passes:
    # tunnel jitter is tens of ms per RPC, and the first passes of a
    # process ramp ~35% beyond the compile warm)
    mc, stats, dt = timed_passes(one_pass)

    crc_ok = sum(s.crc_ok for s in stats)
    crc_bad = sum(s.crc_wrong for s in stats)
    n_events = sum(len(e["kind"]) for e in mc.native_events)
    stream_s = T / BITRATE
    rt_mult = stream_s / (dt / 1)  # x real time for ALL carriers
    res = {
        "n_carriers": n_car, "bits_per_carrier": T, "chunks": n_chunks,
        "wall_s": round(dt, 3), "stream_s": round(stream_s, 3),
        "crc_ok": int(crc_ok), "crc_err": int(crc_bad),
        "native_events": n_events,
        "realtime_carriers_e2e": round(n_car * rt_mult, 1),
        "mbits_per_s": round(n_car * T / dt / 1e6, 1)}
    assert crc_ok > 0 and crc_ok >= 0.9 * (crc_ok + crc_bad), \
        (crc_ok, crc_bad)
    return res


def mixed_batch(n_car, n_frames, enc_frac=0.1, seed=0):
    """[n_car, L] mixed-protocol bits; the last ceil(enc_frac * n_car)
    carriers run the TEA1-encrypted variant. Rows are padded to
    common_len(n_frames) with junction-checked noise BEFORE the
    per-carrier circular roll, so the roll never cuts a burst."""
    rng = np.random.default_rng(seed)
    plain = make_mixed_stream(rng, n_frames, encrypted=False)
    enc = make_mixed_stream(np.random.default_rng(seed + 1), n_frames,
                            encrypted=True)
    L = common_len(n_frames)
    len_nat = len(plain)
    plain = circular_safe_pad(plain, rng, L - len(plain))
    enc = circular_safe_pad(enc, np.random.default_rng(seed + 2),
                            L - len(enc))
    n_enc = max(1, int(round(n_car * enc_frac)))
    bits = np.empty((n_car, L), np.uint8)
    bits[: n_car - n_enc] = plain
    bits[n_car - n_enc:] = enc
    # LARGE per-carrier circular stagger — varies lock offsets AND
    # decorrelates carrier content, so the wideband composite the
    # prod stage synthesizes from this batch sums Gaussian instead
    # of a Dirichlet pulse train (see run_wideband's note). Starts
    # confined to the screened noise window (safe_rolls) so no
    # carrier cold-starts mid-frame.
    rolls = safe_rolls(n_car, L, L - len_nat)
    for c in range(n_car):
        bits[c] = np.roll(bits[c], rolls[c])
    return bits, n_enc


def run_mixed(n_car=1024, n_frames=16, n_chunks=4, enc_frac=0.1):
    """Timed end-to-end pass over the FULL protocol mix (NDB/SCH_HD,
    stolen/STCH, traffic+voice, FRAG/END chains, mid-stream relocks,
    >=10% TEA1-encrypted carriers) through the native control plane —
    the non-sanitized integrated number. All stages share
    common_len(n_frames) captures, so the fused-chunk programs compile
    once on the rig."""
    import tempfile
    bits, n_enc = mixed_batch(n_car, n_frames, enc_frac)
    T = bits.shape[1]
    cuts = np.linspace(0, T, n_chunks + 1).astype(int)
    ksf = tempfile.NamedTemporaryFile("w", suffix=".keys", delete=False)
    ksf.write(KEYSTORE)
    ksf.close()

    def one_pass():
        mc = MultiCarrierReceiver(np.zeros(n_car), fs=25_000.0 * n_car,
                                  control_plane="native",
                                  keystore_path=ksf.name)
        for k in range(n_chunks):
            stats = mc.process_bits(bits[:, cuts[k]:cuts[k + 1]],
                                    final=k == n_chunks - 1)
        return mc, stats

    mc, stats, dt = timed_passes(one_pass)

    crc_ok = sum(s.crc_ok for s in stats)
    crc_bad = sum(s.crc_wrong for s in stats)
    from tetra_tpu.umac.native_exec import EV
    kinds = np.concatenate([e["kind"] for e in mc.native_events])
    stream_s = T / BITRATE
    res = {
        "n_carriers": n_car, "n_encrypted": n_enc,
        "bits_per_carrier": T, "chunks": n_chunks,
        "wall_s": round(dt, 3), "stream_s": round(stream_s, 3),
        "crc_ok": int(crc_ok), "crc_err": int(crc_bad),
        "traffic_slots": int((kinds == EV.TRAFFIC).sum()),
        "tl_sdus": int((kinds == EV.TLSDU).sum()),
        "frag_ends": int((kinds == EV.FRAG_END).sum()),
        "realtime_carriers_e2e": round(n_car * stream_s / dt, 1),
        "mbits_per_s": round(n_car * T / dt / 1e6, 1)}
    assert crc_bad == 0 and crc_ok > 0, (crc_ok, crc_bad)
    assert res["traffic_slots"] > 0 and res["frag_ends"] > 0
    return res


def _wideband_pass(bits, n_car, n_chunks, keystore=None, snr_db=None,
                   demod="hard"):
    """Shared wideband runner: per-carrier bits -> FFT-synthesized
    composite -> companded 4+4-bit capture (quantize_iq4c, ONE byte
    per complex sample = 25 kB/s-carrier h2d) -> chunked process_iq4c
    through the on-device PFB + native plane. Warm + 3 timed passes;
    returns (mc, stats, median wall, h2d bytes).

    snr_db adds AWGN at that per-CHANNEL SNR before quantization (at
    full occupancy per-channel SNR equals composite SNR); demod="soft"
    runs the degraded-signal fastpath mode."""
    from tetra_tpu.phy import dqpsk, channelizer
    from tetra_tpu.io import stream as stream_mod
    n_car = bits.shape[0]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        base = np.asarray(dqpsk.modulate(bits, sps=2))
    wide = channelizer.synthesize_wideband_fft(base, np.arange(n_car),
                                               n_car)
    if snr_db is not None:
        rng = np.random.default_rng(99)
        sig = np.mean(np.abs(wide) ** 2) / n_car       # per-carrier power
        npow = sig * n_car / (10 ** (snr_db / 10))     # full-band noise
        wide = (wide + rng.normal(0, np.sqrt(npow / 2), wide.shape)
                + 1j * rng.normal(0, np.sqrt(npow / 2), wide.shape)
                ).astype(np.complex64)
    packed = stream_mod.quantize_iq4c(wide.real, wide.imag)
    S = len(packed)
    cuts = np.linspace(0, S, n_chunks + 1).astype(int)
    chans = np.arange(n_car, dtype=np.int32)

    def one_pass():
        mc = MultiCarrierReceiver([], fs=25_000.0 * n_car,
                                  pfb_channels=chans, n_chan=n_car,
                                  control_plane="native",
                                  keystore_path=keystore, demod=demod)
        for k in range(n_chunks):
            stats = mc.process_iq4c(packed[cuts[k]:cuts[k + 1]],
                                    final=k == n_chunks - 1)
        return mc, stats

    mc, stats, dt = timed_passes(one_pass)
    return mc, stats, dt, S


def run_wideband(n_car=1024, n_frames=16, n_chunks=4):
    """Timed end-to-end pass ingesting ONE companded 4+4-bit WIDEBAND
    capture (quantize_iq4c: 1 byte per complex sample = 25 kB/s-carrier
    on the h2d link) and channelizing on device via the Pallas PFB —
    the production input format (reference whole-capture front end:
    src/demod/osmosdr-tetra_demod_fft.py:64-96) instead of
    pre-demodulated per-carrier slot streams, on the clean SYNC/SCH_F
    protocol mix. Records the h2d bytes per carrier-second next to the
    per-carrier ingest formats."""
    rng = np.random.default_rng(0)
    row = make_stream(rng, n_frames)
    n_tail = common_len(n_frames) - len(row)
    row = circular_safe_pad(row, rng, n_tail)
    bits = np.tile(row, (n_car, 1))
    # LARGE per-carrier circular stagger: identical time-aligned
    # content on every channel makes the composite a Dirichlet
    # pulse train (measured kurtosis 44, 25-sigma peaks) that no
    # fixed-point capture format survives; real carriers carry
    # independent content and sum Gaussian. Starts confined to the
    # screened noise window (safe_rolls) — never mid-burst, never a
    # mid-frame cold start.
    rolls = safe_rolls(n_car, bits.shape[1], n_tail)
    for c in range(n_car):
        bits[c] = np.roll(bits[c], rolls[c])
    T_bits = bits.shape[1]
    mc, stats, dt, S = _wideband_pass(bits, n_car, n_chunks)
    crc_ok = sum(s.crc_ok for s in stats)
    crc_bad = sum(s.crc_wrong for s in stats)
    stream_s = T_bits / BITRATE
    res = {
        "n_carriers": n_car, "bits_per_carrier": T_bits,
        "wideband_samples": S, "chunks": n_chunks,
        "wall_s": round(dt, 3), "stream_s": round(stream_s, 3),
        "crc_ok": int(crc_ok), "crc_err": int(crc_bad),
        "h2d_bytes_per_carrier_s": round(S / stream_s / n_car, 1),
        "realtime_carriers_e2e": round(n_car * stream_s / dt, 1),
    }
    assert crc_ok > 0 and crc_bad == 0, (crc_ok, crc_bad)
    return res


def run_snr8(n_car=1024, n_frames=16, n_chunks=4, snr_db=8.0):
    """Degraded-input operation AT SCALE: the run_wideband capture with
    AWGN at 8 dB per-channel SNR, decoded by the fastpath SOFT mode
    (int8 soft demod + soft Viterbi + 2-bit-tolerant sync scan). The
    reference's feedback demod works on noisy RF as its only mode
    (src/demod/cqpsk.py:253-270); this stage proves the TPU scale path
    does too — the recorded crc_ok compares against the clean
    wideband stage's on the same capture (bench.py derives the
    fraction)."""
    rng = np.random.default_rng(0)
    row = make_stream(rng, n_frames)
    n_tail = common_len(n_frames) - len(row)
    row = circular_safe_pad(row, rng, n_tail)
    bits = np.tile(row, (n_car, 1))
    rolls = safe_rolls(n_car, bits.shape[1], n_tail)
    for c in range(n_car):
        bits[c] = np.roll(bits[c], rolls[c])
    T_bits = bits.shape[1]
    mc, stats, dt, S = _wideband_pass(bits, n_car, n_chunks,
                                      snr_db=snr_db, demod="soft")
    crc_ok = sum(s.crc_ok for s in stats)
    crc_bad = sum(s.crc_wrong for s in stats)
    stream_s = T_bits / BITRATE
    res = {
        "n_carriers": n_car, "bits_per_carrier": T_bits, "snr_db": snr_db,
        "wall_s": round(dt, 3), "stream_s": round(stream_s, 3),
        "crc_ok": int(crc_ok), "crc_err": int(crc_bad),
        "h2d_bytes_per_carrier_s": round(S / stream_s / n_car, 1),
        "realtime_carriers_e2e": round(n_car * stream_s / dt, 1),
    }
    assert crc_ok > 0, crc_ok
    return res


def run_prod(n_car=1024, n_frames=16, n_chunks=4, enc_frac=0.1):
    """THE production configuration end to end: ONE companded 4+4-bit
    wideband RF capture (25 kB/s-carrier h2d) carrying the FULL
    protocol mix — NDB/SCH_HD half-slot pairs, fully stolen STCH,
    traffic+voice, FRAG-START/MAC-END chains, frame-18 AACH windows,
    a forced mid-stream relock, >=10% TEA1-encrypted carriers —
    channelized on device through the Pallas PFB and decoded by the
    native control plane with hot-path decryption. Zero CRC errors
    required. This composes stages 9 and 10: the production input
    format carrying the production protocol mix (reference analogue:
    one osmosdr demod + float_to_bits + tetra-rx process chain per
    carrier, src/demod/osmosdr-tetra_demod_fft.py:64-96 +
    src/receiver1udp:71-78).

    mixed_batch pads to common_len(n_frames) — the same per-carrier
    length as run_wideband — so both stages share ONE compiled program
    set on the rig."""
    import tempfile
    bits, n_enc = mixed_batch(n_car, n_frames, enc_frac)
    T_bits = bits.shape[1]
    ksf = tempfile.NamedTemporaryFile("w", suffix=".keys", delete=False)
    ksf.write(KEYSTORE)
    ksf.close()
    mc, stats, dt, S = _wideband_pass(bits, n_car, n_chunks,
                                      keystore=ksf.name)
    crc_ok = sum(s.crc_ok for s in stats)
    crc_bad = sum(s.crc_wrong for s in stats)
    from tetra_tpu.umac.native_exec import EV
    kinds = np.concatenate([e["kind"] for e in mc.native_events])
    stream_s = T_bits / BITRATE
    res = {
        "n_carriers": n_car, "n_encrypted": n_enc,
        "bits_per_carrier": T_bits, "wideband_samples": S,
        "chunks": n_chunks,
        "wall_s": round(dt, 3), "stream_s": round(stream_s, 3),
        "crc_ok": int(crc_ok), "crc_err": int(crc_bad),
        "traffic_slots": int((kinds == EV.TRAFFIC).sum()),
        "tl_sdus": int((kinds == EV.TLSDU).sum()),
        "frag_ends": int((kinds == EV.FRAG_END).sum()),
        "h2d_bytes_per_carrier_s": round(S / stream_s / n_car, 1),
        "realtime_carriers_e2e": round(n_car * stream_s / dt, 1),
        "mbits_per_s": round(n_car * T_bits / dt / 1e6, 1)}
    assert crc_bad == 0 and crc_ok > 0, (crc_ok, crc_bad)
    assert res["traffic_slots"] > 0 and res["frag_ends"] > 0
    assert res["tl_sdus"] > 0
    return res


def main():
    n_car = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    if len(sys.argv) > 4 and sys.argv[4] == "mixed":
        print(json.dumps(run_mixed(n_car, n_frames, n_chunks)))
        return
    print(json.dumps(run(n_car, n_frames, n_chunks)))


if __name__ == "__main__":
    main()
