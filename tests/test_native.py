"""Native staging engine: correctness, concurrency stress, and a
ThreadSanitizer build (SURVEY §5.2 — the reference ships no sanitizer
coverage for its threaded native code; we do)."""
import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from ntransformer_tpu.memory.native import StagePool

SRC = os.path.join(os.path.dirname(__file__), os.pardir,
                   "ntransformer_tpu", "csrc", "ntstage.cpp")


def test_stagepool_concurrent_stress():
    """Many overlapping reads + copies across jobs land exactly."""
    pool = StagePool(8)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, 1 << 22, dtype=np.uint8)  # 4 MB
    f = tempfile.NamedTemporaryFile(delete=False)
    f.write(data.tobytes())
    f.close()
    try:
        dests = [np.zeros(1 << 20, np.uint8) for _ in range(8)]
        jobs = []
        for i, d in enumerate(dests):
            off = (i % 4) << 20
            jobs.append((pool.read(f.name, off, 1 << 20, d), off, d))
        copies = [np.zeros(1 << 20, np.uint8) for _ in range(4)]
        cjobs = [pool.copy(data[i << 20:], c, 1 << 20)
                 for i, c in enumerate(copies)]
        for h, off, d in jobs:
            pool.wait(h)
            np.testing.assert_array_equal(d, data[off: off + (1 << 20)])
        for i, h in enumerate(cjobs):
            pool.wait(h)
            np.testing.assert_array_equal(
                copies[i], data[i << 20: (i + 1) << 20])
    finally:
        os.unlink(f.name)
        pool.close()


def test_stagepool_read_error():
    pool = StagePool(2)
    dest = np.zeros(4096, np.uint8)
    if pool.native:
        with pytest.raises(OSError):
            pool._fd("/nonexistent/file/path")
    else:
        h = pool.read("/nonexistent/file/path", 0, 4096, dest)
        with pytest.raises(OSError):
            pool.wait(h)
    pool.close()


def test_aligned_empty_alignment():
    from ntransformer_tpu.memory.native import aligned_empty
    for size in (1, 4095, 4096, 1 << 20):
        a = aligned_empty(size)
        assert a.ctypes.data % 4096 == 0
        assert a.nbytes == size
        a[:] = 7  # writable, base kept alive
        assert int(a[0]) == 7


def test_stagepool_direct_read_correct_and_falls_back():
    """O_DIRECT reads (tier-C page-cache bypass, ref streamer.cu:384-525):
    aligned request reads exactly; every misaligned precondition falls back
    to the buffered path and still reads exactly."""
    from ntransformer_tpu.memory.native import DIRECT_ALIGN, aligned_empty
    pool = StagePool(4)
    rng = np.random.default_rng(1)
    n = 64 * 4096 + 512  # unaligned tail like a real pack's last bytes
    data = rng.integers(0, 255, n, dtype=np.uint8)
    f = tempfile.NamedTemporaryFile(delete=False)
    f.write(data.tobytes())
    f.close()
    try:
        # aligned offset + aligned buffer + extent within file -> direct
        dest = aligned_empty(8 * 4096)
        h = pool.read(f.name, 4096, 8 * 4096, dest, direct=True)
        pool.wait(h)
        np.testing.assert_array_equal(dest, data[4096: 9 * 4096])

        # unaligned offset -> buffered fallback, still exact
        dest2 = aligned_empty(4096)
        h = pool.read(f.name, 100, 4096, dest2, direct=True)
        pool.wait(h)
        np.testing.assert_array_equal(dest2, data[100: 100 + 4096])

        # unaligned destination buffer -> buffered fallback
        dest3 = np.empty(4096 + 1, np.uint8)[1:]
        if dest3.ctypes.data % DIRECT_ALIGN == 0:  # (unlucky alignment)
            dest3 = np.empty(4096 + 3, np.uint8)[3:]
        h = pool.read(f.name, 4096, 4096, dest3, direct=True)
        pool.wait(h)
        np.testing.assert_array_equal(dest3, data[4096: 2 * 4096])

        # rounded extent past EOF (unpadded tail) -> buffered fallback
        tail_off = (n // 4096) * 4096
        tail_len = n - tail_off
        dest4 = aligned_empty(4096)
        h = pool.read(f.name, tail_off, tail_len, dest4, direct=True)
        pool.wait(h)
        np.testing.assert_array_equal(dest4[:tail_len], data[tail_off:])
    finally:
        os.unlink(f.name)
        pool.close()


def test_pack_file_padded_for_direct(tmp_path):
    """PackWriter pads the file end to 4096 so every layer's rounded
    O_DIRECT extent stays inside the file."""
    from ntransformer_tpu.core.gguf import GGUFReader
    from ntransformer_tpu.memory.pack import PackWriter
    from tools.make_test_gguf import write_model
    g = str(tmp_path / "tiny.gguf")
    write_model(g, "tiny", "q8_0", seed=2)
    pack = PackWriter(GGUFReader(g)).write(str(tmp_path / "t.ntp"))
    assert os.path.getsize(pack.path) % 4096 == 0
    last = pack.layer_meta(pack.n_layers - 1)
    rounded = (last["size"] + 4095) // 4096 * 4096
    assert last["offset"] + rounded <= os.path.getsize(pack.path)


def test_streamer_direct_io_roundtrip(tmp_path, monkeypatch):
    """Tiered forward with NT_DIRECT_IO on (default) matches the resident
    forward — the full direct-I/O staging path end to end."""
    import jax.numpy as jnp
    from ntransformer_tpu.core.gguf import GGUFReader
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.models.loader import load_model
    from ntransformer_tpu.models.tiered import (TieredKV, forward_tiered,
                                                load_model_tiered)
    from tools.make_test_gguf import write_model
    g = str(tmp_path / "tiny.gguf")
    write_model(g, "tiny", "q8_0", seed=6)
    monkeypatch.setenv("NT_DIRECT_IO", "1")
    tm = load_model_tiered(g, max_hbm_layers=1, max_ram_layers=1,
                           hbm_bytes=64 << 30, ram_bytes=64 << 30)
    assert tm.streamer.direct_io
    rm = load_model(g)
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    lt, _, _ = forward_tiered(tm, TieredKV.create(tm.arch, tm.tiers), toks, 0)
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), toks, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


TSAN_DRIVER = r"""
// pure-C++ TSAN driver: hammer the pool with overlapping reads + copies
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdlib.h>
#include <unistd.h>
#include <vector>

extern "C" {
void *ntstage_create(int);
void ntstage_destroy(void *);
int ntstage_open(const char *, int);
unsigned long ntstage_submit_read(void *, int, unsigned long, unsigned long,
                                  void *, int);
unsigned long ntstage_submit_copy(void *, const void *, void *,
                                  unsigned long, int);
int ntstage_wait(void *, unsigned long);
}

int main() {
    const size_t MB = 1 << 20, CH = 1 << 18;
    std::vector<unsigned char> data(MB);
    for (size_t i = 0; i < MB; i++) data[i] = (unsigned char)(i * 7);
    char path[] = "/tmp/ntstage_tsan_XXXXXX";
    int tfd = mkstemp(path);
    assert(write(tfd, data.data(), MB) == (ssize_t)MB);
    close(tfd);

    void *pool = ntstage_create(8);
    int fd = ntstage_open(path, 0);
    std::vector<std::vector<unsigned char>> dests(16,
        std::vector<unsigned char>(CH));
    std::vector<std::vector<unsigned char>> copies(8,
        std::vector<unsigned char>(CH));
    std::vector<unsigned long> jobs;
    for (int i = 0; i < 16; i++)
        jobs.push_back(ntstage_submit_read(pool, fd, (i % 4) * CH, CH,
                                           dests[i].data(), 4));
    for (int i = 0; i < 8; i++)
        jobs.push_back(ntstage_submit_copy(pool, data.data() + (i % 4) * CH,
                                           copies[i].data(), CH, 4));
    for (auto j : jobs) assert(ntstage_wait(pool, j) == 0);
    for (int i = 0; i < 16; i++)
        assert(memcmp(dests[i].data(), data.data() + (i % 4) * CH, CH) == 0);
    for (int i = 0; i < 8; i++)
        assert(memcmp(copies[i].data(), data.data() + (i % 4) * CH, CH) == 0);
    ntstage_destroy(pool);
    unlink(path);
    printf("TSAN-OK\n");
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("g++") is None, reason="no toolchain")
def test_ntstage_tsan():
    """Build a pure-C++ driver with -fsanitize=thread and hammer the pool;
    TSAN aborts on a data race, failing this test."""
    d = tempfile.mkdtemp(prefix="ntstage_tsan_")
    drv = os.path.join(d, "driver.cpp")
    exe = os.path.join(d, "driver")
    with open(drv, "w") as f:
        f.write(TSAN_DRIVER)
    try:
        subprocess.run(
            ["g++", "-O1", "-g", "-std=c++17", "-pthread",
             "-fsanitize=thread", os.path.abspath(SRC), drv, "-o", exe],
            check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        pytest.skip(f"tsan build unavailable: {e.stderr.decode()[:200]}")
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1 exitcode=66")
    r = subprocess.run([exe], capture_output=True, env=env, timeout=120)
    assert r.returncode == 0, (r.stderr.decode()[-800:] or r.stdout.decode())
    assert b"TSAN-OK" in r.stdout
