"""Multi-host (jax.distributed) execution tests.

A 2-process x 4-virtual-CPU-device cluster is spawned as real OS processes
running the CLI (collectives via Gloo), validating the code path that
cannot run in-process: per-process FASTQ striping, global batch assembly
with jax.make_array_from_process_local_data, replicated-stats escalation,
multi-host-safe checkpoint/merge. Outputs must byte-match the reference
binary's golden VCF (SURVEY §2.4 "DCN across hosts"; BASELINE N>=2 hosts).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the worker sets its own platform/device-count (conftest pinned ours)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _spawn_cluster(args_per_proc, timeout=560):
    procs = [subprocess.Popen(a, cwd=REPO, env=_clean_env(),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for a in args_per_proc]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    return outs


def _geno_cmd(prefix, out_vcf, port, pid, extra=()):
    return [sys.executable, "-m", "vargeno_tpu.cli", "geno",
            prefix, os.path.join(FIX, "reads.fq"),
            os.path.join(FIX, "snps.vcf"), out_vcf,
            "--batch-reads", "128",
            "--multihost", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--mh-cpu-devices", "4", *extra]


@pytest.fixture(scope="module")
def mini_prefix(tmp_path_factory):
    """Index at a prefix path the spawned CLI processes can load."""
    d = tmp_path_factory.mktemp("mh_idx")
    prefix = str(d / "idx")
    subprocess.run(
        [sys.executable, "-m", "vargeno_tpu.cli", "index",
         os.path.join(FIX, "genome.fa"), os.path.join(FIX, "snps.vcf"),
         prefix],
        cwd=REPO, env=_clean_env(), check=True, capture_output=True,
        timeout=560)
    return prefix


def _golden():
    return open(os.path.join(FIX, "golden_output.vcf"), "rb").read()


@pytest.mark.slow
@pytest.mark.parametrize("mode", [(), ("--mh-inline-dual",)],
                         ids=["queued-retry", "inline-dual"])
def test_multihost_dp_golden(mini_prefix, tmp_path, mode):
    """Both orientation protocols must byte-match the reference golden:
    the default lockstep queued-retry (~1.5x device work, retry schedule
    derived from replicated stats) and the inline dual step (2x)."""
    out = str(tmp_path / "out.vcf")
    port = _free_port()
    _spawn_cluster([
        _geno_cmd(mini_prefix, out, port, 0, mode),
        _geno_cmd(mini_prefix, str(tmp_path / "ignored.vcf"), port, 1,
                  mode),
    ])
    assert open(out, "rb").read() == _golden()


@pytest.mark.slow
def test_multihost_sharded_dict_golden(mini_prefix, tmp_path):
    out = str(tmp_path / "out.vcf")
    port = _free_port()
    _spawn_cluster([
        _geno_cmd(mini_prefix, out, port, 0, ("--sharded-dict",)),
        _geno_cmd(mini_prefix, str(tmp_path / "ignored.vcf"), port, 1,
                  ("--sharded-dict",)),
    ])
    assert open(out, "rb").read() == _golden()


@pytest.mark.slow
def test_multihost_queued_escalation_golden(mini_prefix, tmp_path):
    """Forced capacity overflow under the lockstep queued-retry protocol:
    undersized event/probe caps must trip the replicated overflow
    counters, escalate identically on both processes (the retry schedule
    is derived from the SAME replicated stats the escalation reads), and
    still byte-match golden."""
    out = str(tmp_path / "out.vcf")
    port = _free_port()
    tiny = ("--events-per-read", "4", "--probe-hit-cap", "2",
            "--agree-cap", "1")
    _spawn_cluster([
        _geno_cmd(mini_prefix, out, port, 0, tiny),
        _geno_cmd(mini_prefix, str(tmp_path / "ignored.vcf"), port, 1,
                  tiny),
    ])
    assert open(out, "rb").read() == _golden()


@pytest.mark.slow
def test_multihost_checkpoint_resume(mini_prefix, tmp_path):
    """Interrupt after 3 global batches, resume, byte-match golden. The
    checkpoint holds merged layout-independent counts + the global read
    count; the strided readers of the resumed cluster skip exactly the
    consumed reads."""
    out = str(tmp_path / "out.vcf")
    ck = str(tmp_path / "ck")
    port = _free_port()
    _spawn_cluster([
        _geno_cmd(mini_prefix, out, port, 0,
                  ("--checkpoint", ck, "--limit-batches", "3")),
        _geno_cmd(mini_prefix, str(tmp_path / "i.vcf"), port, 1,
                  ("--checkpoint", ck, "--limit-batches", "3")),
    ])
    assert os.path.exists(ck + ".npz")
    port = _free_port()
    _spawn_cluster([
        _geno_cmd(mini_prefix, out, port, 0, ("--checkpoint", ck)),
        _geno_cmd(mini_prefix, str(tmp_path / "i.vcf"), port, 1,
                  ("--checkpoint", ck)),
    ])
    assert open(out, "rb").read() == _golden()


def test_strided_reader_partitions_exactly():
    """Union of all stripes == the plain reader's stream, in global batch
    order, with identical global_n_valid on every stripe."""
    from vargeno_tpu.io.fastq import (iter_read_batches,
                                      iter_read_batches_strided)

    fq = os.path.join(FIX, "reads.fq")
    ref = list(iter_read_batches(fq, 64, 128, 4))
    total = sum(b.n_valid for b in ref)
    cat = lambda xs: np.concatenate(xs) if xs else np.zeros((0,))
    all_codes = cat([b.codes[:b.n_valid] for b in ref])

    P, LB = 4, 16
    per = [list(iter_read_batches_strided(fq, LB, P, p, 128, 4))
           for p in range(P)]
    assert len({len(x) for x in per}) == 1
    for p in range(1, P):
        assert ([b.global_n_valid for b in per[p]]
                == [b.global_n_valid for b in per[0]])
    assert sum(b.global_n_valid for b in per[0]) == total
    rows = []
    for g in range(len(per[0])):
        for p in range(P):
            b = per[p][g]
            rows.append(b.codes[:b.n_valid])
    assert (np.concatenate(rows) == all_codes).all()

    # global skip (checkpoint resume) drops exactly the first N reads
    sk = list(iter_read_batches_strided(fq, LB, P, 2, 128, 4,
                                        skip_reads=100))
    assert sum(b.global_n_valid for b in sk) == total - 100
