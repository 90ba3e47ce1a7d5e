"""Differential end-to-end parity vs the COMPILED REFERENCE receiver.

tools/ref_rx.c links the reference's actual burst synchronizer
(phy/tetra_burst_sync.c), burst splitter (phy/tetra_burst.c), TDMA clock
and full lower MAC (lower_mac/*.c) into a mini-receiver driven by the
reference's own 64-byte read loop (tetra-rx.c:82-95), with the upper MAC
replaced by a per-TMV-record printer (plus the AACH traffic-detection
side effects). This test runs that oracle and TetraReceiver over the
same captures — clean, bit-corrupted, burst-corrupted (lock loss +
relock), truncated, and traffic-bearing — and requires bit-identical
per-slot decisions:

  * SYNC-acquisition events (buffer-relative bit offsets)
  * processed-slot (BURST) counts, i.e. identical TDMA clock advance
  * lock-loss and bad-offset decisions
  * every TMV-SAP record: TDMA time, lchan, CRC verdict, blk_num and
    the decoded type-1 bits (including CRC-WRONG slots, which pins the
    Viterbi tie-breaking semantics)
  * traffic dump files (byte-identical)

This is the reference's own regression methodology (tetra-rx-tests.sh
counts per-capture CRC-OK lines) strengthened to full per-slot diffs.
"""
import os
import re
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import constants as C, tx, testpdu
from tetra_tpu.rx import TetraReceiver
from tests.test_rx_e2e import build_capture, MCC, MNC, CC, INIT

REF = "/root/reference/src"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_SOURCES = [
    "phy/tetra_burst_sync.c", "phy/tetra_burst.c", "tetra_tdma.c",
    "tetra_common.c", "tetra_mac_pdu.c",
    "lower_mac/tetra_lower_mac.c", "lower_mac/tetra_scramb.c",
    "lower_mac/tetra_interleave.c", "lower_mac/tetra_conv_enc.c",
    "lower_mac/crc_simple.c", "lower_mac/tetra_rm3014.c",
    "lower_mac/viterbi.c", "lower_mac/viterbi_cch.c",
]

_REC = re.compile(r"^REC t=(\d+)/(\d+)/(\d+) lchan=(\d+) crc=(\d+) "
                  r"blk=(-?\d+) len=(\d+) bits=([01]*)$")
_FOUND = re.compile(r"found SYNC training sequence in bit #(\d+)")
_BAD = re.compile(r"#### SYNC burst at offset (\d+)\?!\?")
_LOST = "#### could not find successive burst training sequence"


@pytest.fixture(scope="session")
def ref_rx_bin(tmp_path_factory):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    out = str(tmp_path_factory.mktemp("refrx") / "ref_rx")
    cmd = ["gcc", "-O1", "-o", out, os.path.join(REPO, "tools/ref_rx.c")]
    cmd += [os.path.join(REF, s) for s in REF_SOURCES]
    cmd += ["-I" + os.path.join(REPO, "tools/stubs"), "-I" + REF]
    subprocess.run(cmd, check=True)
    return out


def run_oracle(binary, bits, dumpdir):
    cap = os.path.join(dumpdir, "cap.bits")
    np.asarray(bits, dtype=np.uint8).tofile(cap)
    r = subprocess.run([binary, "-d", dumpdir, cap], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    recs, founds = [], []
    bursts = 0
    for ln in r.stdout.splitlines():
        m = _REC.match(ln)
        if m:
            recs.append(tuple(int(g) for g in m.groups()[:7]) + (m.group(8),))
            continue
        m = _FOUND.search(ln)
        if m:
            founds.append(int(m.group(1)))
        elif ln == "BURST":
            bursts += 1
    bads = [int(m.group(1)) for m in map(_BAD.search,
                                         r.stderr.splitlines()) if m]
    losts = r.stderr.count(_LOST)
    return {"recs": recs, "founds": founds, "bursts": bursts,
            "bads": bads, "losts": losts}


def run_ours(bits, dumpdir):
    lines = []
    rx = TetraReceiver(dumpdir=dumpdir,
                       log=lambda *a: lines.append(" ".join(str(x) for x in a)))
    rx.tmv_records = []
    rx.process_bits(bits)
    founds, bads = [], []
    bursts = losts = 0
    for ln in lines:
        m = _FOUND.search(ln)
        if m:
            founds.append(int(m.group(1)))
            continue
        m = _BAD.search(ln)
        if m:
            bads.append(int(m.group(1)))
        elif ln.strip() == "BURST":
            bursts += 1
        elif _LOST in ln:
            losts += 1
    return {"recs": rx.tmv_records, "founds": founds, "bursts": bursts,
            "bads": bads, "losts": losts}


def assert_parity(bits, ref_rx_bin, tmp_path, check_dumps=False):
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    ref = run_oracle(ref_rx_bin, bits, str(ref_dir))
    ours = run_ours(bits, str(our_dir))
    assert ours["founds"] == ref["founds"], "sync acquisition diverged"
    assert ours["bursts"] == ref["bursts"], "processed-slot count diverged"
    assert ours["bads"] == ref["bads"], "bad-offset decisions diverged"
    assert ours["losts"] == ref["losts"], "lock-loss decisions diverged"
    assert len(ours["recs"]) == len(ref["recs"]), \
        f"record count {len(ours['recs'])} vs {len(ref['recs'])}"
    for i, (a, b) in enumerate(zip(ours["recs"], ref["recs"])):
        assert a == b, f"record {i} diverged:\n ours {a}\n ref  {b}"
    if check_dumps:
        ref_dumps = sorted(p.name for p in ref_dir.glob("traffic_*.out"))
        our_dumps = sorted(p.name for p in our_dir.glob("traffic_*.out"))
        assert our_dumps == ref_dumps
        for name in ref_dumps:
            assert (our_dir / name).read_bytes() == (ref_dir / name).read_bytes()
    return ref


def build_traffic_capture(n_frames=4, seed=3):
    """Control frames interleaved with AACH-marked traffic SCH/F slots."""
    rng = np.random.default_rng(seed)
    stream = [rng.integers(0, 2, size=97).astype(np.uint8)]
    aach_ctrl = testpdu.make_access_assign_bits()
    aach_traffic = testpdu.make_access_assign_bits(hdr=3, f1=5, f2=0)
    sysinfo = testpdu.make_sysinfo_pdu()
    stream.append(tx.make_sync_burst(
        testpdu.make_sync_pdu(cc=CC, tn=4, fn=17, mn=3, mcc=MCC, mnc=MNC),
        sysinfo, aach_ctrl, jnp.uint32(INIT)))
    for f in range(n_frames):
        sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=f + 1, mn=1,
                                     mcc=MCC, mnc=MNC)
        stream.append(tx.make_sync_burst(sync, sysinfo, aach_ctrl,
                                         jnp.uint32(INIT)))
        for tn in (2, 3, 4):
            aach = aach_traffic if (f + tn) % 2 else aach_ctrl
            payload = rng.integers(0, 2, size=268).astype(np.int8)
            stream.append(tx.make_schf_burst(payload, aach, jnp.uint32(INIT)))
    return np.concatenate(stream)


class TestRefParity:
    def test_clean_capture(self, ref_rx_bin, tmp_path):
        bits, _ = build_capture(n_frames=6)
        ref = assert_parity(bits, ref_rx_bin, tmp_path)
        assert len(ref["recs"]) > 40
        assert all(r[4] == 1 for r in ref["recs"])  # everything CRC-OK

    def test_truncated_capture(self, ref_rx_bin, tmp_path):
        bits, _ = build_capture(n_frames=4)
        assert_parity(bits[: len(bits) - 731], ref_rx_bin, tmp_path)

    @pytest.mark.parametrize("seed,flips", [(11, 40), (12, 120), (13, 400)])
    def test_bitflip_corruption(self, ref_rx_bin, tmp_path, seed, flips):
        """Random bit flips: CRC verdicts, Viterbi outputs on damaged
        blocks, and any induced sync-loss/relock must all match."""
        bits, _ = build_capture(n_frames=6, seed=seed)
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(bits), size=flips, replace=False)
        bits = bits.copy()
        bits[idx] ^= 1
        ref = assert_parity(bits, ref_rx_bin, tmp_path)
        assert ref["bursts"] > 0

    def test_burst_corruption_relock(self, ref_rx_bin, tmp_path):
        """A destroyed stretch forces lock loss; reacquisition decisions
        (incl. the reference's growing UNLOCKED scan window and its
        prefilter quirks) must match bit-for-bit."""
        bits1, _ = build_capture(n_frames=3, seed=21)
        gap = np.random.default_rng(22).integers(
            0, 2, size=1337).astype(np.uint8)
        bits2, _ = build_capture(n_frames=3, seed=23, noise_prefix=11)
        stream = np.concatenate([bits1, gap, bits2])
        ref = assert_parity(stream, ref_rx_bin, tmp_path)
        assert len(ref["founds"]) >= 2
        assert ref["losts"] + len(ref["bads"]) >= 1

    @pytest.mark.parametrize("seed", list(range(30, 38)))
    def test_randomized_corruption_soak(self, ref_rx_bin, tmp_path, seed):
        """Randomized damage soak: mixtures of flips and erased spans
        drive the state machine through varied window geometries."""
        rng = np.random.default_rng(seed)
        bits, _ = build_capture(n_frames=5, seed=seed,
                                noise_prefix=int(rng.integers(0, 700)))
        bits = bits.copy()
        idx = rng.choice(len(bits), size=int(rng.integers(30, 300)),
                         replace=False)
        bits[idx] ^= 1
        span = int(rng.integers(0, 800))
        start = int(rng.integers(0, len(bits) - span))
        bits[start:start + span] = rng.integers(0, 2, size=span)
        assert_parity(bits, ref_rx_bin, tmp_path)

    def test_traffic_routing_and_dumps(self, ref_rx_bin, tmp_path):
        """AACH-driven traffic detection: dump-file routing and the
        suppressed SCH/F records must match, dumps byte-identical."""
        bits = build_traffic_capture()
        ref = assert_parity(bits, ref_rx_bin, tmp_path, check_dumps=True)
        # some SCH/F slots were treated as traffic: fewer SCH_F records
        # than normal bursts
        schf_recs = [r for r in ref["recs"] if r[3] == 1]
        aach_recs = [r for r in ref["recs"] if r[3] == 8]
        assert len(schf_recs) < len(aach_recs)

    def test_long_multiframe_soak(self, ref_rx_bin, tmp_path):
        """Many frames with periodic damage (fast smoke version of the
        10k-slot soak below)."""
        parts = []
        rng = np.random.default_rng(99)
        for k in range(6):
            b, _ = build_capture(n_frames=8, seed=100 + k,
                                 noise_prefix=int(rng.integers(0, 300)))
            b = b.copy()
            idx = rng.choice(len(b), size=60, replace=False)
            b[idx] ^= 1
            parts.append(b)
        assert_parity(np.concatenate(parts), ref_rx_bin, tmp_path)

    def test_ten_thousand_slot_soak(self, ref_rx_bin, tmp_path):
        """>=10k slots through both receivers with per-block random
        damage: flips, erased spans, and noise gaps between blocks —
        every sync/lock/CRC/type-1 decision must stay bit-identical
        over the long haul (fragslot aging, TDMA wraps, repeated
        relocks)."""
        rng = np.random.default_rng(777)
        bases = [build_capture(n_frames=16, seed=200 + k,
                               noise_prefix=0)[0] for k in range(4)]
        parts = []
        slots = 0
        while slots < 10_000:
            b = bases[int(rng.integers(0, 4))].copy()
            nf = int(rng.integers(10, 200))
            idx = rng.choice(len(b), size=nf, replace=False)
            b[idx] ^= 1
            if rng.random() < 0.3:  # occasional destroyed stretch
                span = int(rng.integers(100, 900))
                start = int(rng.integers(0, len(b) - span))
                b[start:start + span] = rng.integers(0, 2, size=span)
            parts.append(b)
            if rng.random() < 0.2:  # inter-block noise gap (forces relock)
                parts.append(rng.integers(
                    0, 2, size=int(rng.integers(50, 400))).astype(np.uint8))
            slots += len(b) // 510
        stream = np.concatenate(parts)
        assert len(stream) // 510 >= 10_000
        ref = assert_parity(stream, ref_rx_bin, tmp_path)
        assert ref["bursts"] >= 7_000          # mostly locked
        assert len(ref["founds"]) >= 10        # plenty of re-acquisitions
        ok = sum(1 for r in ref["recs"] if r[4] == 1)
        assert ok > 5_000 and ok < len(ref["recs"])  # mix of OK and damaged
