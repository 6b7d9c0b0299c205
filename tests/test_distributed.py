"""Multi-host (shared-filesystem) CLI runs: striped mapping shards merge to
the single-host circ_report."""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _cli(args, cwd, env):
    subprocess.run([sys.executable, "-m", "circminer_tpu.cli"] + args,
                   check=True, cwd=cwd, env=env, capture_output=True)


def test_stripe_pairs():
    from circminer_tpu.parallel.distributed import stripe_pairs
    items = list(range(10))
    s0 = list(stripe_pairs(items, 0, 3))
    s1 = list(stripe_pairs(items, 1, 3))
    s2 = list(stripe_pairs(items, 2, 3))
    assert s0 == [0, 3, 6, 9] and s1 == [1, 4, 7] and s2 == [2, 5, 8]
    assert list(stripe_pairs(items, 1, 3, with_index=True))[0] == (1, 1)


def test_two_host_run_matches_single(tmp_path):
    env = _env()
    tmp = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic.py"),
         "--out", tmp, "--genome-len", "60000", "--n-reads", "1500",
         "--circ-frac", "0.4", "--seed", "55"],
        check=True, cwd=tmp, env=env, capture_output=True)
    _cli(["--index", "-r", "ref.fa", "-k", "20"], tmp, env)

    base = ["-r", "ref.fa", "-g", "ref.gtf", "-1", "R1.fq", "-2", "R2.fq",
            "--device", "native"]
    # single host
    _cli(base + ["-o", "single"], tmp, env)
    with open(os.path.join(tmp, "single.circ_report"), "rb") as f:
        want = f.read()
    assert want, "single-host run found no events"

    # two 'hosts' sequentially over the shared directory: host 1 maps only,
    # host 0 maps then merges every shard's remain files for the circ stage
    _cli(base + ["-o", "multi", "--num-hosts", "2", "--host-id", "1"],
         tmp, env)
    _cli(base + ["-o", "multi", "--num-hosts", "2", "--host-id", "0"],
         tmp, env)
    with open(os.path.join(tmp, "multi.circ_report"), "rb") as f:
        got = f.read()
    assert got == want


def test_coordinated_two_process_run_matches_single(tmp_path):
    """Two CONCURRENT processes under a real jax.distributed coordinator
    (distributed.py:38-42): the merged circ_report must equal the
    single-host one, and the wall-clock ratio is recorded as the 1->2
    process scaling proxy (BASELINE.md >=80% target; this 2-core CI box
    only records the number)."""
    import socket
    import time
    env = _env()
    # strip the axon plugin dir so JAX_PLATFORMS=cpu is honored in the
    # children (tests/conftest.py documents the override quirk)
    env["PYTHONPATH"] = REPO
    tmp = str(tmp_path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic.py"),
         "--out", tmp, "--genome-len", "25000", "--n-reads", "200",
         "--circ-frac", "0.3", "--seed", "77"],
        check=True, cwd=tmp, env=env, capture_output=True)
    _cli(["--index", "-r", "ref.fa", "-k", "20"], tmp, env)

    base = ["-r", "ref.fa", "-g", "ref.gtf", "-1", "R1.fq", "-2", "R2.fq",
            "--device", "native"]
    t0 = time.time()
    _cli(base + ["-o", "single"], tmp, env)
    t_single = time.time() - t0
    with open(os.path.join(tmp, "single.circ_report"), "rb") as f:
        want = f.read()
    assert want

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    cmd = [sys.executable, "-m", "circminer_tpu.cli"] + base + [
        "-o", "coord", "--coordinator", coord, "--num-hosts", "2"]
    t0 = time.time()
    procs = [subprocess.Popen(cmd + ["--host-id", str(h)], cwd=tmp, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for h in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    t_multi = time.time() - t0
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]
    with open(os.path.join(tmp, "coord.circ_report"), "rb") as f:
        got = f.read()
    assert got == want
    print(f"[coord-scaling] single={t_single:.1f}s two-proc={t_multi:.1f}s "
          f"proxy-efficiency={t_single / max(t_multi, 1e-9) / 1:.2f}")
