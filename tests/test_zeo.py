"""Zeopy — the optional Zeo++ wrapper (SURVEY.md §3.7).

No Zeo++ binary exists in this environment, so these tests pin the two
halves we own outright: the CSSR writer (cell conversion + fractional
coords) and the ``.nt2`` parser against synthetic files in the documented
``network -nt2`` layout (``Vertex table:`` / ``Edge table:`` sections),
including the atom-id base auto-detection and the marker-less fallback.
"""
import numpy as np
import pytest

from sitator_tpu.core.structure import Structure
from sitator_tpu.util.zeo import Zeopy, ZeoppNotFoundError


@pytest.fixture
def structure():
    cell = np.array([[6.0, 0, 0], [0, 7.0, 0], [0, 0, 8.0]])
    pos = np.array([[0.5, 0.5, 0.5], [3.0, 3.5, 4.0], [1.0, 6.0, 2.0],
                    [5.0, 1.0, 7.0]])
    return Structure(pos, np.array([16, 16, 16, 3], np.int32), cell)


NT2_SECTIONED = """\
Vertex table:
0 1.25 2.5 3.75 0.92 1 2 3 4
1 4.0 5.0 6.0 0.55 2 3 4 1

Edge table:
0 -> 1 0.4 0 0 0 2.75
1 -> 0 0.4 0 0 0 2.75
"""


def test_parse_nt2_sectioned_one_based(tmp_path, structure):
    f = tmp_path / "net.nt2"
    f.write_text(NT2_SECTIONED)
    with pytest.warns(UserWarning, match="experimental"):
        nodes, verts, radii = Zeopy._parse_nt2(str(f), structure)
    np.testing.assert_allclose(nodes, [[1.25, 2.5, 3.75], [4.0, 5.0, 6.0]])
    np.testing.assert_allclose(radii, [0.92, 0.55])
    # ids covered [1, 4] with n_atoms=4 -> detected 1-based, shifted down
    np.testing.assert_array_equal(verts[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(verts[1], [1, 2, 3, 0])


def test_parse_nt2_sectioned_zero_based(tmp_path, structure):
    text = ("Vertex table:\n"
            "0 1.0 1.0 1.0 0.7 0 1 2 3\n"
            "1 2.0 2.0 2.0 0.6 3 2 1 0\n"
            "\nEdge table:\n0 -> 1 0.3 0 0 0 1.7\n")
    f = tmp_path / "net.nt2"
    f.write_text(text)
    with pytest.warns(UserWarning):
        nodes, verts, radii = Zeopy._parse_nt2(str(f), structure)
    assert len(nodes) == 2
    # min id 0 -> 0-based, used as-is
    np.testing.assert_array_equal(verts[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(verts[1], [3, 2, 1, 0])


def test_parse_nt2_edge_lines_not_swallowed(tmp_path, structure):
    """Edge-table rows (`a -> b ...`) must never be parsed as vertices."""
    f = tmp_path / "net.nt2"
    f.write_text(NT2_SECTIONED)
    with pytest.warns(UserWarning):
        nodes, _, _ = Zeopy._parse_nt2(str(f), structure)
    assert len(nodes) == 2


def test_parse_nt2_fallback_without_markers(tmp_path, structure):
    """Marker-less files (older/variant builds) sniff vertex-shaped lines."""
    text = ("some header\n"
            "0 1.0 2.0 3.0 0.8 1 2 3 4\n"
            "1 2.0 3.0 4.0 0.7 4 3 2 1\n"
            "unrelated trailing text\n")
    f = tmp_path / "net.nt2"
    f.write_text(text)
    with pytest.warns(UserWarning):
        nodes, verts, radii = Zeopy._parse_nt2(str(f), structure)
    assert len(nodes) == 2 and len(verts[0]) == 4
    np.testing.assert_array_equal(verts[0], [0, 1, 2, 3])


def test_parse_nt2_out_of_range_ids_raise(tmp_path, structure):
    text = "Vertex table:\n0 1.0 1.0 1.0 0.5 7 8\n\nEdge table:\n"
    f = tmp_path / "net.nt2"
    f.write_text(text)
    with pytest.warns(UserWarning):
        with pytest.raises(ValueError, match="not a decomposition"):
            Zeopy._parse_nt2(str(f), structure)


def test_write_cssr_roundtrip_values(tmp_path, structure):
    path = tmp_path / "s.cssr"
    Zeopy._write_cssr(structure, str(path))
    lines = path.read_text().splitlines()
    a, b, c = (float(x) for x in lines[0].split())
    np.testing.assert_allclose([a, b, c], [6.0, 7.0, 8.0], atol=1e-6)
    angles = [float(x) for x in lines[1].split()[:3]]
    np.testing.assert_allclose(angles, [90.0, 90.0, 90.0], atol=1e-4)
    assert lines[2].split()[0] == "4"
    # fractional coords of atom 1 (row index 4): pos / diag(cell)
    parts = lines[5].split()
    np.testing.assert_allclose([float(parts[2]), float(parts[3]),
                                float(parts[4])],
                               [0.5, 0.5, 0.5], atol=1e-6)


def test_missing_binary_raises():
    with pytest.raises(ZeoppNotFoundError, match="native periodic"):
        with Zeopy(executable="definitely-not-a-real-binary-xyz"):
            pass


def test_zeopy_full_subprocess_roundtrip(tmp_path, monkeypatch):
    """The whole Zeopy pipeline against a MOCK `network` binary (the only
    untestable piece in this environment is the real binary's output
    format, SURVEY.md §0): CSSR written, subprocess invoked with the
    documented flags, nt2 parsed — and the parsed decomposition equals
    the native VoronoiSiteGenerator's, which authored the nt2 fixture
    (1-based ids, documented section layout)."""
    import os
    import stat

    from sitator_tpu import SiteNetwork, Structure
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    # a 2x2x2 SC lattice; native decomposition = ground truth
    grid = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    s = Structure(grid * 4.0, np.full(8, 16), np.eye(3) * 8.0)
    sn0 = SiteNetwork(s, np.ones(8, bool), np.zeros(8, bool))
    seeds = VoronoiSiteGenerator(verbose=False).run(sn0)

    # author the nt2 exactly as the documented layout describes
    nt2 = tmp_path / "baked.nt2"
    with open(nt2, "w") as f:
        f.write("Vertex table:\n")
        for i, (c, v, r) in enumerate(zip(seeds.centers, seeds.vertices,
                                          seeds.site_radii)):
            ids = " ".join(str(int(a) + 1) for a in v)   # 1-based
            f.write(f"{i} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} {r:.6f} {ids}\n")
        f.write("\nEdge table:\n0 -> 1 0.5\n")

    # mock `network` binary: records argv, copies the baked nt2 into the
    # output path Zeopy asked for
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "network"
    exe.write_text(f"""#!/bin/sh
echo "$@" > {tmp_path}/argv.txt
out=""
prev=""
for a in "$@"; do
  if [ "$prev" = "-nt2" ]; then out="$a"; fi
  prev="$a"
done
cp {nt2} "$out"
""")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    with pytest.warns(UserWarning, match="experimental"):
        with Zeopy() as z:
            nodes, verts, radii = z.voronoi(s)
    argv = (tmp_path / "argv.txt").read_text().split()
    assert "-nt2" in argv and "-nor" in argv      # non-radial invocation
    assert argv[-1].endswith(".cssr")
    np.testing.assert_allclose(nodes, seeds.centers, atol=1e-5)
    np.testing.assert_allclose(radii, seeds.site_radii, atol=1e-5)
    assert len(verts) == seeds.n_sites
    for got, want in zip(verts, seeds.vertices):
        assert set(got.tolist()) == set(int(a) for a in want)

    # radial route passes the radii table instead of -nor
    with pytest.warns(UserWarning, match="experimental"):
        with Zeopy() as z:
            z.voronoi(s, radial=True, radii={"S": 1.8})
    argv = (tmp_path / "argv.txt").read_text().split()
    assert "-r" in argv and "-nor" not in argv


def test_parse_nt2_fuzz_corruptions(tmp_path, structure):
    """Corrupted nt2 content must parse to sane arrays or raise ValueError —
    never an unhandled exception (same contract as the trajectory decoders,
    tests/test_native_fuzz.py)."""
    import warnings

    base = NT2_SECTIONED.encode()
    rng = np.random.default_rng(42)

    def corrupt(data):
        op = rng.integers(0, 5)
        b = bytearray(data)
        if op == 0 and len(b) > 1:
            return bytes(b[: rng.integers(1, len(b))])
        if op == 1 and len(b) > 4:
            lo = int(rng.integers(0, len(b) - 2))
            hi = int(rng.integers(lo + 1, min(len(b), lo + 30)))
            b[lo:hi] = bytes(rng.integers(32, 127, hi - lo, dtype=np.uint8))
            return bytes(b)
        lines = data.split(b"\n")
        if op == 2 and len(lines) > 2:
            del lines[rng.integers(0, len(lines))]
        elif op == 3 and len(lines) > 2:
            i = int(rng.integers(0, len(lines)))
            lines.insert(i, lines[i])
        else:
            i = int(rng.integers(0, len(lines)))
            toks = lines[i].split()
            if toks:
                toks[rng.integers(0, len(toks))] = b"#@!"
                lines[i] = b" ".join(toks)
        return b"\n".join(lines)

    blobs = [corrupt(base) for _ in range(40)]
    blobs += [b"", b"\n\n", b"Vertex table:\n", b"Edge table:\nonly edges",
              bytes(rng.integers(0, 256, 256, dtype=np.uint8)),
              b"Vertex table:\n0 nan inf -inf 1e400 1 2\nEdge table:\n"]
    for k, blob in enumerate(blobs):
        p = tmp_path / f"f{k}.nt2"
        p.write_bytes(blob)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                nodes, verts, radii = Zeopy._parse_nt2(str(p), structure)
            except (ValueError, OSError) as e:
                continue
        nodes = np.asarray(nodes)
        assert nodes.ndim in (1, 2)          # empty or (n, 3)
        if nodes.size:
            assert nodes.shape[1] == 3
            assert len(verts) == len(nodes) == len(radii)
            for v in verts:
                assert ((v >= 0) & (v < structure.n_atoms)).all(), \
                    f"out-of-range vertex ids in case {k}: {v}"
