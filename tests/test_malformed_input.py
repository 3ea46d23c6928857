"""Malformed-input behavior: clear, actionable errors (or spec'd recovery)
instead of numpy tracebacks or silent wrong answers.

The reference aborts via assert on short reads of its binary formats
(util.c:15) and would silently drop every read of a CRLF FASTQ (the '\\r'
reads as a non-ACGT base, qv.cc:812-828); these are deliberate
improvements, checked never to change behavior on well-formed inputs.
"""

import os
import warnings

import numpy as np
import pytest

from vargeno_tpu.errors import FastqError, IndexFormatError, InputError, \
    VcfError
from vargeno_tpu.io.fastq import iter_read_batches

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")

RECORD = b"@r%d\nACGTACGTACGTACGTACGTACGTACGTACGTACGT\n+\n" \
         b"IIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIII\n"


def _write(path, data: bytes):
    with open(path, "wb") as f:
        f.write(data)
    return str(path)


def _read_all(path, use_native):
    out = []
    for b in iter_read_batches(path, 8, 128, 4, use_native=use_native):
        out.append((b.codes[:b.n_valid].copy(), b.n_kmers[:b.n_valid].copy(),
                    b.qual[:b.n_valid].copy()))
    codes = np.concatenate([c for c, _, _ in out]) if out else np.zeros(
        (0, 128), np.uint8)
    nk = np.concatenate([k for _, k, _ in out]) if out else np.zeros(
        0, np.int32)
    q = np.concatenate([x for _, _, x in out]) if out else np.zeros(
        (0, 4), np.uint8)
    return codes, nk, q


@pytest.fixture(params=[True, False], ids=["native", "python"])
def use_native(request):
    if request.param:
        from vargeno_tpu import native

        if not native.available():
            pytest.skip("native runtime unavailable")
    return request.param


def test_crlf_fastq_parses_like_lf(tmp_path, use_native):
    """CRLF FASTQs must parse identically to LF (a '\\r' treated as a base
    would silently drop EVERY read)."""
    lf = _write(tmp_path / "lf.fq", b"".join(RECORD % i for i in range(5)))
    crlf = _write(tmp_path / "crlf.fq",
                  b"".join((RECORD % i).replace(b"\n", b"\r\n")
                           for i in range(5)))
    a = _read_all(lf, use_native)
    b = _read_all(crlf, use_native)
    for x, y in zip(a, b):
        assert (x == y).all()
    assert a[1].shape[0] == 5 and (a[1] == 1).all()


def test_truncated_fastq_raises(tmp_path, use_native):
    """A file ending mid-record raises FastqError naming the problem, not
    silently dropping the tail."""
    data = b"".join(RECORD % i for i in range(3)) + b"@r3\nACGTACGT"
    bad = _write(tmp_path / "trunc.fq", data)
    with pytest.raises(FastqError, match="mid-record"):
        _read_all(bad, use_native)


def test_qual_length_mismatch_warns(tmp_path, use_native):
    rec = b"@r0\n" + b"ACGT" * 16 + b"\n+\nIII\n"   # 64-base seq, 3-char qual
    bad = _write(tmp_path / "mm.fq", rec * 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        codes, nk, q = _read_all(bad, use_native)
    assert any("quality line" in str(x.message) for x in w)
    assert nk.shape[0] == 2 and (nk == 2).all()   # reads still parsed


def test_corrupt_npz_index_raises(tmp_path):
    from vargeno_tpu.index import store

    p = str(tmp_path / "idx")
    _write(tmp_path / "idx.vgt.npz", b"this is not a zip archive")
    with pytest.raises(IndexFormatError, match="unreadable"):
        store.load(p)


def test_truncated_ref_dict_raises(tmp_path):
    from vargeno_tpu.index import store

    p = str(tmp_path / "x.ref.dict")
    _write(tmp_path / "x.ref.dict",
           np.array([1000, 0], "<u8").tobytes() + b"\x00" * 13)
    with pytest.raises(IndexFormatError, match="promises 1000 dict rows"):
        store.read_ref_dict(p)
    _write(tmp_path / "x.ref.dict", b"\x00" * 8)   # short header
    with pytest.raises(IndexFormatError, match="header"):
        store.read_ref_dict(p)


def test_truncated_bf_raises(tmp_path):
    from vargeno_tpu.index import store

    p = str(tmp_path / "x.bf")
    _write(tmp_path / "x.bf",
           np.array([1 << 20], "<u8").tobytes() + b"\x00" * 64)
    with pytest.raises(IndexFormatError, match="truncated"):
        store.read_sdsl_bf(p)


def test_malformed_vcf_row_raises(tmp_path):
    from vargeno_tpu.io.vcf import iter_vcf_rows

    p = _write(tmp_path / "bad.vcf",
               b"#CHROM\tPOS\n"
               b"chr1\t100\t.\tA\tC\t.\t.\t.\n"
               b"chr1 200 . A C . . .\n")     # space-separated row
    with pytest.raises(VcfError, match="POS"):
        list(iter_vcf_rows(p))


def test_corrupt_checkpoint_raises(tmp_path):
    from vargeno_tpu.engine import checkpoint

    p = str(tmp_path / "ck")
    _write(tmp_path / "ck.npz", b"garbage")
    _write(tmp_path / "ck.json", b"{\"n_reads\": 5}")
    with pytest.raises(InputError, match="checkpoint"):
        checkpoint.load(p)
    # absent checkpoint is still a clean None (fresh start)
    assert checkpoint.load(str(tmp_path / "nope")) is None


def test_cli_reports_input_error_cleanly(tmp_path, capsys):
    """The CLI prints one `error: ...` line and exits 2 on malformed
    input instead of dumping a traceback."""
    from vargeno_tpu import cli

    fa = _write(tmp_path / "g.fa", b">chr1\n" + b"ACGT" * 32 + b"\n")
    bad = _write(tmp_path / "bad.vcf", b"chr1\tnotanint\t.\tA\tC\t.\t.\t.\n")
    rc = cli.main(["vcfd", fa, bad, str(tmp_path / "o.ref.dict"),
                   str(tmp_path / "o.snp.dict")])
    captured = capsys.readouterr()
    assert rc == 2
    assert "error:" in captured.err and "POS" in captured.err
    assert "Traceback" not in captured.err
