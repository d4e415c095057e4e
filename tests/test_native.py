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
