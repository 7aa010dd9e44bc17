"""L8 tool suite: avg, max-segmentation, sort-states, genome tools,
sam-to-counts, pyhammlet RLE/io."""

import gzip
import io
import subprocess
import sys

import numpy as np
import pytest

from hammlet_tpu.pyhammlet import (
    RunLengthArray,
    readBlockSizes,
    readCompressedStateSequences,
    readMarginals,
    shatter,
)
from hammlet_tpu.tools.avg import run as avg_run
from hammlet_tpu.tools.max_segmentation import run as maxseg_run
from hammlet_tpu.tools.sam_to_counts import sam_to_counts
from hammlet_tpu.tools.genome import (
    GenomeGetter,
    combine_counts_main,
    read_count_set,
    write_count_set,
)
from collections import OrderedDict


def test_avg():
    out = io.StringIO()
    avg_run(3, io.StringIO("1 2 3 4 5 6 7"), out)
    assert out.getvalue().split() == ["2", "5", "7"]


def test_max_segmentation_merges():
    marg = "10\t5\t1\t0\n5\t4\t2\t0\n7\t0\t9\t1\n3\t0\t1\t8\n"
    out = io.StringIO()
    maxseg_run(io.StringIO(marg), out)
    lines = [tuple(map(int, l.split("\t"))) for l in out.getvalue().splitlines()]
    # reference prints the running segment when argmax changes (starting with
    # an implicit empty state-0 segment)
    assert lines == [(15, 0), (7, 1), (3, 2)]


def test_max_segmentation_matches_reference_tool(tmp_path):
    """Compare against the compiled reference maxSegmentation binary."""
    ref = tmp_path / "maxseg"
    r = subprocess.run(
        ["g++", "-O2", "--std=c++11", "-include", "limits", "-o", str(ref),
         "/root/reference/src/tools/maxSegmentation.cpp"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip("cannot compile reference tool")
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(50):
        rows.append(
            f"{rng.integers(1, 20)}\t"
            + "\t".join(str(rng.integers(0, 30)) for _ in range(4))
        )
    marg = "\n".join(rows) + "\n"
    want = subprocess.run(
        [str(ref)], input=marg, capture_output=True, text=True
    ).stdout
    out = io.StringIO()
    maxseg_run(io.StringIO(marg), out)
    assert out.getvalue() == want


def test_rle_roundtrip():
    a = RunLengthArray(sizes=[3, 2, 4], array=np.array([5, 7, 5]))
    assert len(a) == 9
    assert a.decompress().tolist() == [5, 5, 5, 7, 7, 5, 5, 5, 5]
    assert a[0] == 5 and a[3] == 7 and a[5] == 5
    c = RunLengthArray(sizes=[3, 2, 4], array=np.array([5, 5, 5])).compress()
    assert c.nrSegments() == 1 and len(c) == 9


def test_rle_shatter():
    a = RunLengthArray(sizes=[4, 4], array=np.array([1, 2]))
    b = RunLengthArray(sizes=[2, 6], array=np.array([9, 8]))
    a2, b2 = shatter(a, b)
    assert a2.ends.tolist() == b2.ends.tolist() == [2, 4, 8]
    assert a2.decompress().tolist() == a.decompress().tolist()
    assert b2.decompress().tolist() == b.decompress().tolist()


def test_pyhammlet_readers(tmp_path):
    (tmp_path / "m.csv").write_text("5\t10\t0\n3\t2\t8\n")
    m = readMarginals(tmp_path / "m.csv")
    assert m.shape == (8, 2)
    assert m.argmax().decompress().tolist() == [0] * 5 + [1] * 3

    (tmp_path / "s.csv").write_text("5:0\t3:1\n2:1\t6:0\n")
    seqs = readCompressedStateSequences(tmp_path / "s.csv")
    assert len(seqs) == 2
    assert seqs[0].decompress().tolist() == [0] * 5 + [1] * 3

    (tmp_path / "b.csv").write_text("4\t4\n2\t6\n")
    blocks = readBlockSizes(tmp_path / "b.csv")
    dec = blocks.decompress()
    assert dec.shape == (8, 2)
    assert dec[0].tolist() == [4, 2]
    assert dec[7].tolist() == [4, 6]


def test_genome_roundtrip_and_combine(tmp_path, capsys):
    data = OrderedDict(
        [
            ("chr1", (np.array([10, 20, 30]), np.array([1, 2, 3]))),
            ("chr2", (np.array([5, 15]), np.array([4, 5]))),
        ]
    )
    write_count_set(str(tmp_path / "a"), data)
    back = read_count_set(str(tmp_path / "a"))
    assert list(back) == ["chr1", "chr2"]
    np.testing.assert_array_equal(back["chr1"][1], [1, 2, 3])

    gg = GenomeGetter(str(tmp_path / "a"))
    seen = []
    while gg.next():
        seen.append((gg.refseq, gg.pos))
    assert seen == [("chr1", 10), ("chr1", 20), ("chr1", 30), ("chr2", 5), ("chr2", 15)]

    # a + a - a == a
    rc = combine_counts_main(
        ["-i", "+", str(tmp_path / "a"), str(tmp_path / "a"), "-",
         str(tmp_path / "a"), "-o", str(tmp_path / "out")]
    )
    assert rc == 0
    out = read_count_set(str(tmp_path / "out"))
    np.testing.assert_array_equal(out["chr1"][1], [1, 2, 3])
    np.testing.assert_array_equal(out["chr2"][0], [5, 15])


def test_sam_to_counts(tmp_path):
    sam = "\n".join(
        [
            "@HD\tVN:1.6",
            "r1\t0\tchr1\t100\t60\t50M\t*\t0\t0\tA\tF",
            "r2\t0\tchr1\t100\t60\t50M\t*\t0\t0\tA\tF",  # same pos, diff read
            "r2b\t0\tchr1\t100\t60\t50M\t*\t0\t0\tA\tF",
            "r3\t4\tchr1\t200\t0\t*\t*\t0\t0\tA\tF",  # unmapped -> skipped
            "r4\t0\tchr2\t50\t60\t50M\t*\t0\t0\tA\tF",
            "r4\t256\tchr2\t60\t60\t50M\t*\t0\t0\tA\tF",  # secondary -> skip
            "r5\t0\tchr1\t300\t60\t50M\t*\t0\t0\tA\tF",
        ]
    )
    fn = tmp_path / "in.sam"
    fn.write_text(sam + "\n")
    sam_to_counts(str(fn), str(tmp_path / "cov"))
    out = read_count_set(str(tmp_path / "cov"))
    np.testing.assert_array_equal(out["chr1"][0], [100, 300])
    np.testing.assert_array_equal(out["chr1"][1], [3, 1])
    np.testing.assert_array_equal(out["chr2"][0], [50])
