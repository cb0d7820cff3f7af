"""Sharded-execution tests on a virtual 8-device CPU mesh.

Determinism contract (SURVEY.md §5): the same input must produce an
identical bitstream across shardings — the sharded batch encode must match
the single-device core bit for bit, including witness order.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from new_bloom_filter_repo_tpu.models.binary_codec import (
    BloomFilterCompressor,
    _filter_scalars,
)
from new_bloom_filter_repo_tpu.models.bloom import optimal_compression_params
from new_bloom_filter_repo_tpu.ops import bloom_core
from new_bloom_filter_repo_tpu.ops.hashtables import get_hash_tables
from new_bloom_filter_repo_tpu.parallel import batch as pbatch
from new_bloom_filter_repo_tpu.parallel.mesh import make_mesh


def cpu_mesh(dp, sp):
    return make_mesh(dp, sp, devices=jax.devices("cpu"))


def _make_batch(n=2048, densities=(0.05, 0.12, 0.2, 0.29,
                                   0.01, 0.08, 0.16, 0.31)):
    rng = np.random.default_rng(0)
    bits = np.stack([(rng.random(n) < d).astype(np.uint8) for d in densities])
    ls, this, tlos, fks = [], [], [], []
    for row in bits:
        p = row.sum() / n
        k, l = optimal_compression_params(n, p)
        k32, floor_k, (t_hi, t_lo) = _filter_scalars(k)
        ls.append(l)
        this.append(t_hi)
        tlos.append(t_lo)
        fks.append(floor_k)
    return (bits,
            np.asarray(ls, np.uint32), np.asarray(this, np.uint32),
            np.asarray(tlos, np.uint32), np.asarray(fks, np.int32))


def _tables_tuple(n):
    t = get_hash_tables(n, "video")
    return (t.h1[0], t.h1[1], t.h2[0], t.h2[1], t.act[0], t.act[1])


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_encode_matches_single_device(dp, sp):
    if len(jax.devices("cpu")) < dp * sp:
        pytest.skip("not enough devices")
    n = 2048
    bits, l, t_hi, t_lo, fk = _make_batch(n)
    l_pad = bloom_core.bitmap_pad(n)
    mesh = cpu_mesh(dp, sp)
    enc = pbatch.make_sharded_encode(mesh, n, l_pad)
    tables = _tables_tuple(n)
    bit_arrays, witness, counts = jax.block_until_ready(
        enc(jnp.asarray(bits), tables, jnp.asarray(l),
            jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(fk)))

    t = get_hash_tables(n, "video")
    for i in range(bits.shape[0]):
        ref_bits, ref_pass, ref_wit, ref_len = bloom_core.encode_core(
            jnp.asarray(bits[i]), t.h1, t.h2, t.act,
            jnp.uint32(l[i]), jnp.uint32(t_hi[i]), jnp.uint32(t_lo[i]),
            floor_k=int(fk[i]), l_pad=l_pad)
        np.testing.assert_array_equal(np.asarray(bit_arrays[i]),
                                      np.asarray(ref_bits))
        assert int(counts[i]) == int(ref_len)
        np.testing.assert_array_equal(
            np.asarray(witness[i])[: int(ref_len)],
            np.asarray(ref_wit)[: int(ref_len)])


def test_sharded_roundtrip():
    n = 2048
    bits, l, t_hi, t_lo, fk = _make_batch(n)
    l_pad = bloom_core.bitmap_pad(n)
    mesh = cpu_mesh(2, 4)
    enc = pbatch.make_sharded_encode(mesh, n, l_pad)
    dec = pbatch.make_sharded_decode(mesh, n, l_pad)
    tables = _tables_tuple(n)
    args = (jnp.asarray(l), jnp.asarray(t_hi), jnp.asarray(t_lo),
            jnp.asarray(fk))
    bit_arrays, witness, counts = enc(jnp.asarray(bits), tables, *args)
    out = dec(bit_arrays, witness, tables, *args)
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_sharded_matches_host_codec_bitstream():
    """Sharded output equals the host BloomFilterCompressor's bitstream."""
    n = 2048
    bits, l, t_hi, t_lo, fk = _make_batch(n)
    mesh = cpu_mesh(1, 8)
    l_pad = bloom_core.bitmap_pad(n)
    enc = pbatch.make_sharded_encode(mesh, n, l_pad)
    tables = _tables_tuple(n)
    bit_arrays, witness, counts = enc(
        jnp.asarray(bits), tables, jnp.asarray(l),
        jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(fk))
    c = BloomFilterCompressor()
    for i in range(bits.shape[0]):
        bitmap, wit, p, _, _ = c.compress(bits[i])
        np.testing.assert_array_equal(
            np.asarray(bit_arrays[i])[: int(l[i])], bitmap)
        np.testing.assert_array_equal(
            np.asarray(witness[i])[: int(counts[i])], wit)


@pytest.mark.slow
def test_blocked_dp_sharding_matches_single_device():
    """Frame-sharded blocked encode over dp equals the unsharded kernels
    (the flagship BFV3 multi-chip path)."""
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk
    from new_bloom_filter_repo_tpu.parallel import blocked_batch

    sys_mod = __import__("sys")
    rng = np.random.default_rng(11)
    F, NB = 8, 16
    bits = (rng.random((F, NB, bk.IPB)) < 0.05).astype(np.uint8)
    a = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    b = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    act = (rng.random((F, NB, bk.IPB)) < 0.4).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int32)
    ms = np.full(F, 100, np.int32)
    fks = np.full(F, 2, np.int32)

    args = tuple(jnp.asarray(x) for x in (bits, a, b, act, vals, ms, fks))
    want = [np.asarray(x) for x in bk.blocked_encode(
        *args, k_lanes=2, vh=4)]

    mesh = cpu_mesh(4, 2)  # dp=4 used; sp axis unused by this path
    enc = blocked_batch.make_blocked_encode_dp(mesh, k_lanes=2, vh=4)
    got = [np.asarray(x) for x in enc(*args)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.slow
def test_blocked_dp_decode_roundtrip():
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk
    from new_bloom_filter_repo_tpu.parallel import blocked_batch

    rng = np.random.default_rng(12)
    F, NB = 4, 8
    bits = (rng.random((F, NB, bk.IPB)) < 0.06).astype(np.uint8)
    a = rng.integers(0, 90, (F, NB, bk.IPB)).astype(np.int32)
    b = rng.integers(0, 90, (F, NB, bk.IPB)).astype(np.int32)
    act = (rng.random((F, NB, bk.IPB)) < 0.3).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int32)
    ms = np.full(F, 90, np.int32)
    fks = np.full(F, 2, np.int32)
    flags = np.zeros(F, np.int32)

    args = tuple(jnp.asarray(x) for x in (bits, a, b, act, vals, ms, fks))
    words, wit, wcnt, vseg, vcnt = bk.blocked_encode(*args, k_lanes=2, vh=4)

    mesh = cpu_mesh(4, 2)
    dec = blocked_batch.make_blocked_decode_dp(mesh, k_lanes=2, vh=4)
    passes, wcnt2, mask, out_vals = dec(
        words, args[1], args[2], args[3], args[5], args[6],
        jnp.asarray(flags), wit, jnp.asarray(np.zeros_like(bits)), vseg)
    np.testing.assert_array_equal(np.asarray(mask), bits)
    np.testing.assert_array_equal(np.asarray(wcnt2), np.asarray(wcnt))


@pytest.mark.slow
def test_blocked_dpsp_sharding_matches_single_device():
    """Frame AND block-axis sharded blocked encode equals unsharded —
    within-frame scaling with zero collectives."""
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk
    from new_bloom_filter_repo_tpu.parallel import blocked_batch

    rng = np.random.default_rng(21)
    F, NB = 2, 32  # 32 blocks over sp=4 -> 8 blocks (1 grid step) each
    bits = (rng.random((F, NB, bk.IPB)) < 0.05).astype(np.uint8)
    a = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    b = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    act = (rng.random((F, NB, bk.IPB)) < 0.4).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int32)
    ms = np.full(F, 100, np.int32)
    fks = np.full(F, 2, np.int32)
    args = tuple(jnp.asarray(x) for x in (bits, a, b, act, vals, ms, fks))

    want = [np.asarray(x) for x in bk.blocked_encode(*args, k_lanes=2, vh=4)]
    mesh = cpu_mesh(2, 4)
    enc = blocked_batch.make_blocked_encode_dpsp(mesh, k_lanes=2, vh=4)
    got = [np.asarray(x) for x in enc(*args)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.slow
def test_blocked_dpsp_decode_matches_single_device():
    """Block-axis sharded membership+expansion equals unsharded — the
    decode mirror of the dpsp encode (4K/8K frames decode sharded too)."""
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk
    from new_bloom_filter_repo_tpu.parallel import blocked_batch

    rng = np.random.default_rng(22)
    F, NB = 2, 32
    bits = (rng.random((F, NB, bk.IPB)) < 0.05).astype(np.uint8)
    a = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    b = rng.integers(0, 100, (F, NB, bk.IPB)).astype(np.int32)
    act = (rng.random((F, NB, bk.IPB)) < 0.4).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int32)
    ms = np.full(F, 100, np.int32)
    fks = np.full(F, 2, np.int32)
    flags = np.zeros(F, np.int32)
    args = tuple(jnp.asarray(x) for x in (bits, a, b, act, vals, ms, fks))
    words, wit, wcnt, vseg, vcnt = bk.blocked_encode(*args, k_lanes=2, vh=4)

    raw = jnp.asarray(np.zeros_like(bits))
    want_pass, want_wcnt = bk.blocked_membership(
        words, args[1], args[2], args[3], args[5], args[6],
        jnp.asarray(flags), k_lanes=2)
    want_mask, want_vals = bk.blocked_expand(
        want_pass, wit, raw, jnp.asarray(flags), vseg, vh=4)

    mesh = cpu_mesh(2, 4)
    dec = blocked_batch.make_blocked_decode_dpsp(mesh, k_lanes=2, vh=4)
    passes, wcnt2, mask, out_vals = dec(
        words, args[1], args[2], args[3], args[5], args[6],
        jnp.asarray(flags), wit, raw, vseg)
    np.testing.assert_array_equal(np.asarray(passes), np.asarray(want_pass))
    np.testing.assert_array_equal(np.asarray(wcnt2), np.asarray(want_wcnt))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))
    np.testing.assert_array_equal(np.asarray(out_vals),
                                  np.asarray(want_vals))
    np.testing.assert_array_equal(np.asarray(mask), bits)


@pytest.mark.slow
def test_4k_frame_sp_sharded_roundtrip():
    """One real 3840x2160 frame encoded AND decoded with the block axis
    sharded over sp, bit-identical to the unsharded kernels (the product
    _MeshDispatch path, including its BG-granularity block padding)."""
    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk

    n = 3840 * 2160
    tab = bp.blocked_tables(n)
    nb, npad = tab["nb"], tab["npad"]
    rng = np.random.default_rng(33)
    flat = np.zeros(npad, np.uint8)
    idx = rng.choice(n, size=int(n * 0.02), replace=False)
    flat[idx] = 1
    bits = jnp.asarray(flat.reshape(1, nb, bk.IPB))
    vals = jnp.asarray(
        rng.integers(0, 1 << 24, (1, nb, bk.IPB)).astype(np.int32))
    m_arr = jnp.asarray(np.array([320], np.int32))
    fk_arr = jnp.asarray(np.array([2], np.int32))
    thi = jnp.asarray(np.array([0x80000000], np.uint32))
    tlo = jnp.asarray(np.array([0], np.uint32))
    flags = jnp.asarray(np.zeros(1, np.int32))
    a, b, act = bp._frame_mod_tables(
        tab["h1"], tab["h2"], tab["act_hi"], tab["act_lo"],
        m_arr, thi, tlo)

    want = [np.asarray(x) for x in bk.blocked_encode(
        bits, a, b, act, vals, m_arr, fk_arr, k_lanes=2, vh=4)]
    # the dispatch returns vseg as device-repacked pixel-major bytes
    want[3] = np.asarray(bp._pack_vseg_bytes(jnp.asarray(want[3]), 3))

    dispatch = bp._MeshDispatch(cpu_mesh(1, 8))
    got = [np.asarray(x) for x in dispatch.encode(
        bits, vals, tab, m_arr, thi, tlo, fk_arr,
        k_lanes=2, vh=4, nw=None, channels=3)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    words, wit, wcnt, vseg, vcnt = [jnp.asarray(x) for x in got]
    # packed (1, NB, nw) i32 words; pad the word axis up to NW
    words_full = jnp.zeros((1, nb, bk.NW), jnp.int32).at[
        :, :, :words.shape[2]].set(words)
    passes, wcnt2 = dispatch.membership(
        words_full, tab, m_arr, thi, tlo, fk_arr, flags,
        k_lanes=2, nw=None)
    raw = jnp.zeros((1, nb, bk.IPB), jnp.uint8)
    mask, out_vals = dispatch.expand(passes, wit, raw, flags, vseg,
                                     vh=4, channels=3)
    np.testing.assert_array_equal(np.asarray(wcnt2), np.asarray(wcnt))
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(bits))


class TestMultiHost:
    """DCN scaffolding (SURVEY.md §2 comm row).

    A single-machine CI rig cannot run a real multi-host ring; these
    check the wrapper's single-process behavior and skip the
    cross-host assertions (run them on a pod: one process per host,
    initialize_distributed(), then any dp mesh test)."""

    def test_initialize_distributed_single_process(self):
        # jax.distributed.initialize must run before any backend
        # initialization, so drive the wrapper in a fresh interpreter
        # (with the rig's TPU auto-attach hook disabled).
        import os
        import subprocess
        import sys
        port = 20000 + (os.getpid() % 10000)
        code = (
            "import os; os.environ['JAX_PLATFORMS']='cpu';"
            "from new_bloom_filter_repo_tpu.parallel import mesh;"
            "info = mesh.initialize_distributed("
            f"    coordinator_address='localhost:{port}',"
            "    num_processes=1, process_id=0);"
            "assert info['process_id'] == 0, info;"
            "assert info['num_processes'] == 1, info;"
            "assert info['global_devices'] >= info['local_devices'] >= 1;"
            "info2 = mesh.initialize_distributed();"  # idempotent
            "assert info2['num_processes'] == 1;"
            "print('MULTIHOST_OK')"
        )
        # minimal hermetic env: no TPU auto-attach hook, no inherited
        # JAX/XLA state — the subprocess sees a stock CPU-only jax
        env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
               "HOME": os.environ.get("HOME", "/root"),
               "PYTHONPATH": "/root/repo"}
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=300,
                             cwd="/root/repo", env=env)
        assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr)

    _DCN_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 2)
from new_bloom_filter_repo_tpu.parallel import mesh as pmesh
info = pmesh.initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid)
assert info["num_processes"] == 2 and info["global_devices"] == 4, info
import numpy as np
from new_bloom_filter_repo_tpu.parallel.mesh import make_mesh
from new_bloom_filter_repo_tpu.models.video import ImprovedVideoCompressor
from jax.experimental import multihost_utils as mhu
rng = np.random.default_rng(4)
base = rng.integers(0, 255, (48, 64, 3), np.uint8)
frames = []
for t in range(10):
    f = np.roll(base, t, axis=1).copy()
    f[10:18, (3 * t) % 50:(3 * t) % 50 + 8] = (200, 30, 90)
    frames.append(f)
gmesh = make_mesh(dp=4)   # 2 devices per process -> spans both
comp = ImprovedVideoCompressor(verbose=False, devices=gmesh)
out = os.path.join(tmp, f"dcn_{pid}.bfvc")
comp.compress_video(frames, out, input_color_space="BGR")
dist_bytes = open(out, "rb").read()
if pid == 0:
    comp1 = ImprovedVideoCompressor(verbose=False)   # single device
    ref_path = os.path.join(tmp, "ref.bfvc")
    comp1.compress_video(frames, ref_path, input_color_space="BGR")
    assert dist_bytes == open(ref_path, "rb").read(), "bitstream differs"
    dec = comp1.decompress_video(out)
    assert comp1.verify_lossless(frames, dec)["lossless"]
    print("DCN_BITSTREAM_IDENTICAL_AND_LOSSLESS", flush=True)
mhu.sync_global_devices("dcn-e2e-done")
print(f"DONE_{pid}", flush=True)
"""

    def test_two_process_dcn_bitstream_identical(self, tmp_path):
        """TWO real processes, localhost coordinator, gloo CPU
        collectives, a global dp=4 mesh spanning both (2 virtual CPU
        devices each): the full public-API encode must emit bytes
        IDENTICAL to a single-process encode, and decode lossless.
        This is the DCN path actually running — jax.distributed
        coordination, cross-process device_put sharding, and the
        process_allgather output hop in _MeshDispatch (SURVEY.md §2
        communication-backend row)."""
        import os
        import subprocess
        import sys
        script = str(tmp_path / "dcn_child.py")
        with open(script, "w") as fh:
            fh.write(self._DCN_CHILD)
        port = 21000 + (os.getpid() % 9000)
        env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
               "HOME": os.environ.get("HOME", "/root"),
               "PYTHONPATH": "/root/repo"}
        p1 = subprocess.Popen(
            [sys.executable, script, "1", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env)
        try:
            p0 = subprocess.run(
                [sys.executable, script, "0", str(port), str(tmp_path)],
                capture_output=True, text=True, timeout=600,
                cwd="/root/repo", env=env)
            out1, _ = p1.communicate(timeout=120)
        finally:
            if p1.poll() is None:
                p1.kill()
        assert "DCN_BITSTREAM_IDENTICAL_AND_LOSSLESS" in p0.stdout, (
            p0.stdout, p0.stderr, out1)
        assert "DONE_1" in out1, out1


def test_motion_encode_dp_bitstream_identical():
    """Pan content through a dp mesh: motion search + motion phase A
    shard over frames with zero collectives, and the emitted stream
    (type-6 wrapped records) must be byte-identical to single-device."""
    from new_bloom_filter_repo_tpu.models.video import (
        ImprovedVideoCompressor, verify_lossless)
    rng = np.random.default_rng(11)
    base = rng.integers(0, 240, (64, 96), np.uint8)
    frames = []
    scene = base
    for i in range(9):
        scene = np.roll(np.roll(scene, 1, axis=0), 2, axis=1)
        f = scene.copy()
        f[5:9, 5:9] = i * 20
        frames.append(f)
    streams = []
    for devices in (None, 4):
        comp = ImprovedVideoCompressor(verbose=False, devices=devices)
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "m.bfvc")
            comp.compress_video(frames, p, input_color_space="BGR")
            streams.append(open(p, "rb").read())
            dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]
    assert streams[0] == streams[1]
