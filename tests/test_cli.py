"""The command-line interface: info / convert / analyze drive the real
pipeline and print the documented summary lines."""
import os
import subprocess
import sys

import numpy as np
import pytest

from sitator_tpu.cli import main
from sitator_tpu.io import make_hopping_trajectory, write_xyz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def xyz_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "md.xyz"
    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=2, n_frames=150,
                                 jump_rate=0.03, seed=8)
    write_xyz(str(path), md.structure, md.traj)
    return str(path)


def test_info(xyz_file, capsys):
    assert main(["info", xyz_file]) == 0
    out = capsys.readouterr().out
    assert "format:  xyz" in out
    assert "frames:  150" in out
    assert "Li2" in out and "S8" in out


def test_convert_npy_roundtrip(xyz_file, tmp_path, capsys):
    out_npy = str(tmp_path / "md.npy")
    assert main(["convert", xyz_file, out_npy]) == 0
    arr = np.load(out_npy, mmap_mode="r")
    assert arr.shape == (150, 10, 3)
    with pytest.raises(SystemExit, match=".npy or .zarr"):
        main(["convert", xyz_file, str(tmp_path / "md.bogus")])


def test_convert_zarr(xyz_file, tmp_path):
    pytest.importorskip("tensorstore")
    out = str(tmp_path / "md.zarr")
    assert main(["convert", xyz_file, out]) == 0
    from sitator_tpu.io import TensorstoreTrajectory
    r = TensorstoreTrajectory(out)
    assert len(r) == 150


def test_analyze_full_pipeline(xyz_file, tmp_path, capsys):
    out = str(tmp_path / "result.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--temperature", "600",
               "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "landmark basis:" in text
    assert "final:" in text and "jumps" in text
    assert "D_tracer" in text
    from sitator_tpu.core.sitetraj import SiteTrajectory
    st = SiteTrajectory.load(out)
    assert st.site_network.n_sites > 0
    assert st.n_frames == 150


def test_analyze_species_validation(xyz_file):
    with pytest.raises(SystemExit, match="no atoms of mobile species"):
        main(["analyze", xyz_file, "--mobile", "79"])


def test_mobile_accepts_symbols_and_numbers(xyz_file, capsys):
    assert main(["analyze", xyz_file, "--mobile", "3"]) == 0
    assert "mobile" in capsys.readouterr().out


def test_module_entrypoint_subprocess(xyz_file):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-m", "sitator_tpu", "info", xyz_file],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr
    assert "frames:  150" in proc.stdout


def test_analyze_streaming_matches_eager(xyz_file, tmp_path, capsys):
    """--streaming reproduces the eager pipeline's site count and jump
    total (device accumulators vs in-memory run), and spills labels."""
    out_s = str(tmp_path / "s.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64", "--out", out_s])
    assert rc == 0
    text = capsys.readouterr().out
    assert "streamed 150 frames" in text
    from sitator_tpu import SiteNetwork
    sn_s = SiteNetwork.load(out_s)
    labels = np.load(out_s + ".labels.npy")
    assert labels.shape == (150, 2)

    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--keep-unoccupied"])
    assert rc == 0
    eager = capsys.readouterr().out
    jumps_s = int(sn_s.n_ij.sum() - np.trace(sn_s.n_ij))
    assert f"{jumps_s} jumps" in eager


@pytest.mark.parametrize("fmt", ["xdatcar", "lammps"])
def test_cli_other_text_formats(fmt, tmp_path, capsys):
    from sitator_tpu.io import write_xdatcar, write_lammps_dump
    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=2, n_frames=60,
                                 jump_rate=0.03, seed=10)
    if fmt == "xdatcar":
        path = str(tmp_path / "XDATCAR")
        write_xdatcar(path, md.structure, md.traj)
    else:
        path = str(tmp_path / "dump.lammpstrj")
        write_lammps_dump(path, md.structure, md.traj)
    assert main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "frames:  60" in out
    assert main(["analyze", path, "--mobile", "3",
                 "--cutoff-midpoint", "4.0",
                 "--cutoff-steepness", "3.0"]) == 0
    assert "final:" in capsys.readouterr().out


def test_convert_npy_writes_structure_sidecar(xyz_file, tmp_path, capsys):
    """convert → .npy writes a structure sidecar, and analyze can then
    run on the bare .npy with no --structure (review finding r4)."""
    out_npy = str(tmp_path / "sc.npy")
    assert main(["convert", xyz_file, out_npy]) == 0
    text = capsys.readouterr().out
    sidecar = out_npy + ".structure.xyz"
    assert os.path.exists(sidecar)
    assert "structure sidecar" in text
    rc = main(["analyze", out_npy, "--mobile", "Li",
               "--cutoff-midpoint", "4.0"])
    assert rc == 0
    assert "final:" in capsys.readouterr().out


def test_convert_zarr_flag_overrides_npy_extension(xyz_file, tmp_path):
    """--zarr forces a zarr store even when OUT ends in .npy, as its
    help text promises (review finding r4)."""
    pytest.importorskip("tensorstore")
    out = str(tmp_path / "forced.npy")
    assert main(["convert", xyz_file, out, "--zarr"]) == 0
    from sitator_tpu.io import TensorstoreTrajectory
    assert len(TensorstoreTrajectory(out)) == 150
    # --zarr3 alone implies zarr too
    out3 = str(tmp_path / "forced3.npy")
    assert main(["convert", xyz_file, out3, "--zarr3"]) == 0
    assert len(TensorstoreTrajectory(out3)) == 150


def test_percent_unassigned_is_scaled(xyz_file, capsys):
    """The 'unassigned' figure printed by analyze is a percentage, not
    the raw 0..1 fraction (review finding r4)."""
    assert main(["analyze", xyz_file, "--mobile", "Li",
                 "--cutoff-midpoint", "4.0",
                 "--cutoff-steepness", "3.0"]) == 0
    out = capsys.readouterr().out
    import re
    m = re.search(r"([\d.]+)% unassigned", out)
    assert m is not None
    from sitator_tpu.io import open_trajectory
    # independently recompute: the printed number must be 100x the
    # fraction, so it can only be 0 <= p <= 100 and consistent with a
    # small fraction for this easy trajectory
    assert 0.0 <= float(m.group(1)) <= 100.0


def test_streaming_warns_on_ignored_options(xyz_file, tmp_path, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--streaming",
               "--block-frames", "64",
               "--timestep", "1.0", "--temperature", "600"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "--timestep" in err and "--temperature" in err
    assert "ignored with --streaming" in err


def test_main_module_import_is_safe():
    """Importing sitator_tpu.__main__ must not parse argv or exit
    (review finding r4: pydoc/coverage/module walkers import it)."""
    code = ("import sitator_tpu.__main__; "
            "print('imported-ok')")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "imported-ok" in r.stdout


def test_analyze_diagnose(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--diagnose"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sites tested for memoryless residences" in out
    assert "correlation factor f =" in out
    assert "MSD exponent" in out
    assert "stationarity D2/D1" in out
    assert "detailed balance" in out
    assert "occupancy correlation" in out
    assert "markovianity" in out


def test_analyze_uncertainty(xyz_file, tmp_path, capsys):
    out = str(tmp_path / "unc.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--uncertainty", "50", "--out", out])
    assert rc == 0
    assert "posterior draws" in capsys.readouterr().out
    from sitator_tpu.core.sitetraj import SiteTrajectory
    sn = SiteTrajectory.load(out).site_network
    assert sn.has_attribute("p_ij_lo") and sn.has_attribute("p_ij_hi")
    lo, hi = np.asarray(sn.p_ij_lo), np.asarray(sn.p_ij_hi)
    ok = np.isfinite(lo)
    if ok.any():
        assert np.all(lo[ok] <= hi[ok])
    else:
        # the tiny fixture collapses to a single site: intervals are
        # undefined (no alternative destination) but must still save
        assert sn.n_sites == 1


def test_analyze_merge_metastable(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--merge-metastable"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "metastable merge:" in out and "basins diagnosed" in out
    with pytest.raises(SystemExit, match="integer >= 2"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--merge-metastable", "1"])
    with pytest.raises(SystemExit, match="integer >= 2"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--merge-metastable", "bogus"])


def test_analyze_uncertainty_validates_before_pipeline(xyz_file):
    """--uncertainty N with N < 2 must fail fast (SystemExit, before
    the expensive pipeline), like the sibling --merge-metastable."""
    with pytest.raises(SystemExit, match=">= 2 posterior draws"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--uncertainty", "1"])


def test_diagnose_markovianity_runs_pre_debounce(xyz_file, capsys):
    """With --debounce, the markovianity diagnose must run on the
    PRE-debounce labels (debouncing imposes a minimum-residence floor
    that fails the tests for the filter's reason) and say so."""
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--debounce", "3", "--diagnose"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines()
            if "diagnose: markovianity" in l]
    assert line and "[pre-debounce labels]" in line[0]


def test_arrhenius_subcommand(tmp_path, capsys):
    """The arrhenius subcommand recovers a programmed activation energy
    from a TEMP=PATH series and saves the Ea-annotated network."""
    from sitator_tpu.io import make_hopping_trajectory, write_xyz
    KB = 8.617333262e-5
    EA, NU = 0.25, 0.5
    specs = []
    for i, T in enumerate([700.0, 900.0, 1200.0]):
        rate = NU * np.exp(-EA / (KB * T))
        md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=8,
                                     n_frames=3000, jump_rate=rate,
                                     seed=40 + i)
        path = str(tmp_path / f"md{int(T)}.xyz")
        write_xyz(path, md.structure, md.traj)
        specs.append(f"{T:g}={path}")
    out = str(tmp_path / "ref.npz")
    rc = main(["arrhenius", *specs, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "tracer-D Arrhenius: Ea =" in text
    assert "edge Arrhenius:" in text and "pathways fitted" in text
    import re
    m = re.search(r"site-level median = ([\d.eE+-]+) eV", text)
    assert m and abs(float(m.group(1)) - EA) < 0.08
    from sitator_tpu import SiteNetwork
    ref = SiteNetwork.load(out)
    assert "Ea_ij" in ref.edge_attributes
    assert "Ea_site" in ref.site_attributes
    # malformed series entries fail fast, BEFORE any analysis
    with pytest.raises(SystemExit, match="TEMP=PATH"):
        main(["arrhenius", "bogus", "--mobile", "Li"])
    with pytest.raises(SystemExit, match="bad temperature"):
        main(["arrhenius", "hot=md.xyz", "--mobile", "Li"])
    with pytest.raises(SystemExit, match="at least 2 TEMP"):
        main(["arrhenius", "700=md.xyz", "--mobile", "Li"])
    with pytest.raises(SystemExit, match="distinct temperatures"):
        main(["arrhenius", "700=a.xyz", "700=b.xyz", "--mobile", "Li"])


def test_streaming_postprocesses_from_spilled_labels(xyz_file, tmp_path,
                                                     capsys):
    """With --out set, the streaming route runs label-based
    post-processing (debounce + diagnose) from the spilled label file
    and saves a SiteTrajectory."""
    out = str(tmp_path / "sres.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64",
               "--debounce", "2", "--diagnose", "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "post-processing from the spilled label file" in text
    assert "sites tested for memoryless residences" in text
    assert "site trajectory saved to" in text
    from sitator_tpu.core.sitetraj import SiteTrajectory
    st = SiteTrajectory.load(out)
    assert st.n_frames == 150
    assert "n_ij" in st.site_network.edge_attributes
    # --diagnose ALONE is observational: it must not flip the saved
    # artifact from a SiteNetwork to a SiteTrajectory (review finding)
    out2 = str(tmp_path / "sdiag.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64",
               "--diagnose", "--out", out2])
    assert rc == 0
    text = capsys.readouterr().out
    assert "sites tested for memoryless residences" in text
    assert "site network saved to" in text
    from sitator_tpu import SiteNetwork
    assert SiteNetwork.load(out2).n_sites > 0
    # without --out, label-needing options warn instead
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--streaming",
               "--block-frames", "64", "--debounce", "2"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "unless --out is set" in err


def test_vacancies_flag(xyz_file, tmp_path, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--vacancies"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "vacancies:" in out
    # streaming observational route: vacancies from the spilled labels
    o = str(tmp_path / "v.npz")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64",
               "--vacancies", "--out", o])
    assert rc == 0
    out = capsys.readouterr().out
    assert "vacancies:" in out
    assert "site network saved to" in out      # artifact type unchanged


def test_concerted_flag(tmp_path, capsys):
    path = str(tmp_path / "hoppy.xyz")
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=8, n_frames=600,
                                 jump_rate=0.08, seed=5)
    write_xyz(path, md.structure, md.traj)
    rc = main(["analyze", path, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--concerted"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "concerted:" in out
    assert "cooperative" in out and "window 1" in out
    # streaming observational route: events from the spilled labels,
    # artifact type unchanged
    o = str(tmp_path / "c.npz")
    rc = main(["analyze", path, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64",
               "--concerted", "--concerted-window", "2", "--out", o])
    assert rc == 0
    out = capsys.readouterr().out
    assert "concerted:" in out
    assert "window 2" in out
    assert "site network saved to" in out


def test_onsager_flag(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--temperature", "600",
               "--onsager", "Li:+1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Onsager matrix (Å²/ps" in out
    assert "t_Li = 1.000" in out
    assert "sigma_Onsager(600 K)" in out
    # without --timestep: matrix in frame units, sigma skipped + warning
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--temperature", "600", "--onsager", "3:1"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "Å²/frame" in cap.out
    assert "sigma_Onsager" not in cap.out
    assert "needs --timestep" in cap.err


def test_onsager_flag_validation(xyz_file):
    with pytest.raises(SystemExit, match="SPECIES:CHARGE"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--onsager", "Li"])
    with pytest.raises(SystemExit, match="no atoms"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--onsager", "Au:+1"])
    with pytest.raises(SystemExit, match="bad charge"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--onsager", "Li:x"])
    with pytest.raises(SystemExit, match="listed twice"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--onsager", "Li:+1,Li:-1"])
    with pytest.raises(SystemExit, match="--onsager"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--onsager", "Zz:+1"])


def test_onsager_streaming_warns_ignored(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--streaming", "--block-frames", "64",
               "--onsager", "Li:+1"])
    assert rc == 0
    assert "--onsager" in capsys.readouterr().err


def test_drift_correction_flag(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--drift-correction", "static",
               "--onsager", "Li:+1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "D_tracer" in out
    assert "Onsager matrix" in out
    rc = main(["analyze", xyz_file, "--mobile", "Li", "--streaming",
               "--block-frames", "64", "--drift-correction", "all"])
    assert rc == 0
    assert "--drift-correction" in capsys.readouterr().err


def test_sites_density_seeding(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--sites", "density", "--density-frames", "100",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0"])
    assert rc == 0
    out = capsys.readouterr().out
    # 150 frames / target 100 -> stride 1: all frames sampled
    assert "density sites (sampled 150/150 frames)" in out
    assert "final:" in out
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--sites", "density", "--density-frames", "50",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0"])
    assert rc == 0
    assert "sampled 50/150 frames" in capsys.readouterr().out


def test_doctor(capsys):
    from sitator_tpu.cli import main as cli_main
    rc = cli_main(["doctor", "--probe-size", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "backend: cpu" in out
    assert "probe: 64x64" in out
    assert "healthy" in out


def test_relaxation_flag(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--relaxation", "1.57"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "alpha2 peak" in out
    assert "tau_alpha" in out and " ps" in out
    rc = main(["analyze", xyz_file, "--mobile", "Li", "--streaming",
               "--block-frames", "64", "--relaxation", "1.57"])
    assert rc == 0
    assert "--relaxation" in capsys.readouterr().err


def test_sites_bv_seeding(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--sites", "bv", "--bv-mismatch-tol", "0.9",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bond-valence sites" in out
    assert "final:" in out
    # an impossible tolerance fails with a clean usage error
    with pytest.raises(SystemExit, match="no grid point"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--sites", "bv", "--bv-mismatch-tol", "1e-9"])


def test_barriers_flag(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--temperature", "600", "--barriers"])
    assert rc == 0
    assert "density barriers:" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="needs --temperature"):
        main(["analyze", xyz_file, "--mobile", "Li", "--barriers"])
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--temperature", "600", "--barriers",
               "--barriers-path", "string"])
    assert rc == 0
    assert "density barriers:" in capsys.readouterr().out


def test_report_flag(xyz_file, tmp_path, capsys):
    rpt = str(tmp_path / "rpt")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--temperature", "600",
               "--barriers", "--diagnose", "--report", rpt])
    assert rc == 0
    assert "report written to" in capsys.readouterr().out
    text = open(os.path.join(rpt, "report.md")).read()
    assert "D_tracer" in text
    pngs = ["site_network.png", "msd.png"]
    # --diagnose adds the markovianity section when >= 2 live sites
    if "Markovianity" in text:
        pngs.append("implied_timescales.png")
    # the barriers section appears only when some edge had enough
    # sampling (tiny fixture: may legitimately be empty)
    if "Pathway barriers" in text:
        pngs.append("barriers.png")
    for png in pngs:
        p = os.path.join(rpt, png)
        assert os.path.exists(p) and os.path.getsize(p) > 5000
        assert f"({png})" in text
    # streaming: ignored with a warning
    rc = main(["analyze", xyz_file, "--mobile", "Li", "--streaming",
               "--block-frames", "64", "--report", rpt])
    assert rc == 0
    assert "--report" in capsys.readouterr().err


def test_info_structure_files(tmp_path, capsys):
    p = tmp_path / "POSCAR"
    p.write_text("x\n1.0\n 4 0 0\n 0 4 0\n 0 0 4\nLi O\n1 2\nDirect\n"
                 " 0 0 0\n 0.5 0.5 0.5\n 0.5 0 0.5\n")
    assert main(["info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "poscar (single structure)" in out
    assert "Li1 O2" in out


def test_sites_subcommand_bv_from_cif(tmp_path, capsys):
    """Trajectory-free screening: unit-cell CIF → supercell →
    bond-valence sites, saved and exported."""
    a = 2 * (1.466 + 0.37 * np.log(6.0))
    basis = [(0, 0, 0), (.5, .5, 0), (.5, 0, .5), (0, .5, .5)]
    lines = ["data_t", f"_cell_length_a {a:.6f}",
             f"_cell_length_b {a:.6f}", f"_cell_length_c {a:.6f}",
             "_cell_angle_alpha 90", "_cell_angle_beta 90",
             "_cell_angle_gamma 90", "loop_", "_atom_site_type_symbol",
             "_atom_site_fract_x", "_atom_site_fract_y",
             "_atom_site_fract_z"]
    lines += [f"O {x} {y} {z}" for x, y, z in basis]
    cif = tmp_path / "host.cif"
    cif.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "sites.npz")
    xyz = str(tmp_path / "sites.xyz")
    rc = main(["sites", str(cif), "--mobile", "Li", "--method", "bv",
               "--supercell", "2", "2", "2", "--bv-mismatch-tol", "0.3",
               "--out", out, "--xyz", xyz])
    assert rc == 0
    text = capsys.readouterr().out
    assert "supercell (2, 2, 2): 32 atoms" in text
    assert "32 bond-valence sites for Li" in text
    from sitator_tpu import SiteNetwork
    sn = SiteNetwork.load(out)
    assert sn.n_sites == 32
    assert os.path.getsize(xyz) > 100
    # voronoi route works on the same file
    rc = main(["sites", str(cif), "--mobile", "Li",
               "--supercell", "2", "2", "2"])
    assert rc == 0
    assert "Voronoi sites" in capsys.readouterr().out
    # --xyz honors the extension: a .cif export round-trips through
    # read_cif with the marker species intact
    out_cif = str(tmp_path / "sites_out.cif")
    rc = main(["sites", str(cif), "--mobile", "Li", "--method", "bv",
               "--supercell", "2", "2", "2", "--bv-mismatch-tol", "0.3",
               "--xyz", out_cif])
    assert rc == 0
    from sitator_tpu.io import read_cif
    back = read_cif(out_cif)
    assert (np.asarray(back.species) == 0).sum() == 32  # site markers
    assert (np.asarray(back.species) == 8).sum() == 32  # host O atoms


def test_pathways_line_and_bottlenecks_flag(xyz_file, capsys):
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--bottlenecks"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pathways: " in out
    assert "bottlenecks: base percolation" in out


def test_structure_file_as_trajectory_hint(tmp_path):
    cif = tmp_path / "x.cif"
    cif.write_text("data_x\n_cell_length_a 4\n")
    with pytest.raises(SystemExit, match="single-structure file"):
        main(["analyze", str(cif), "--mobile", "Li"])
    bogus = tmp_path / "junk.bin"
    bogus.write_bytes(b"\x00\x01\x02garbage")
    with pytest.raises(SystemExit, match="unknown trajectory format"):
        main(["info", str(bogus)])


def test_structure_file_hints_cover_all_poscar_shapes(tmp_path, capsys):
    """All four hint paths (review finding r4-late): Direct POSCAR
    (opens as a 1-frame XDATCAR — proactive hint), Cartesian POSCAR
    (open fails — hint), variable-cell XDATCAR named CONTCAR-ish
    (REAL actionable error preserved, no wrong hint), and info on a
    POSCAR still works."""
    direct = tmp_path / "POSCAR"
    direct.write_text("x\n1.0\n 9 0 0\n 0 9 0\n 0 0 9\nS Li\n4 1\n"
                      "Direct\n 0 0 0\n 0.5 0.5 0\n 0.5 0 0.5\n"
                      " 0 0.5 0.5\n 0.25 0.25 0.25\n")
    with pytest.raises(SystemExit, match="single-structure file"):
        main(["analyze", str(direct), "--mobile", "Li"])
    cart = tmp_path / "POSCAR_cart"
    cart.write_text("x\n1.0\n 9 0 0\n 0 9 0\n 0 0 9\nLi\n1\n"
                    "Cartesian\n 1.0 1.0 1.0\n")
    with pytest.raises(SystemExit, match="single-structure file"):
        main(["analyze", str(cart), "--mobile", "Li"])
    # a REAL variable-cell trajectory with a CONTCAR-ish name keeps its
    # actionable error
    npt = tmp_path / "CONTCAR_npt.xdatcar"
    npt.write_text("c\n1.0\n 9 0 0\n 0 9 0\n 0 0 9\nLi\n1\n"
                   "Direct configuration=     1\n 0.1 0.1 0.1\n"
                   "c\n1.1\n 9 0 0\n 0 9 0\n 0 0 9\nLi\n1\n"
                   "Direct configuration=     2\n 0.1 0.1 0.1\n")
    with pytest.raises(SystemExit, match="rescale"):
        main(["analyze", str(npt), "--mobile", "Li"])
    assert main(["info", str(direct)]) == 0
    assert "poscar (single structure)" in capsys.readouterr().out


@pytest.fixture(scope="module")
def tpt_xyz(tmp_path_factory):
    """Longer hopping run so the A->B reactive flux is resolved."""
    path = tmp_path_factory.mktemp("tpt") / "md.xyz"
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=1200, jump_rate=0.05, seed=11)
    write_xyz(str(path), md.structure, md.traj)
    return str(path)


def test_analyze_tpt_with_report(tpt_xyz, tmp_path, capsys):
    pytest.importorskip("matplotlib")
    rep = str(tmp_path / "rep")
    rc = main(["analyze", tpt_xyz, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--tpt", "x", "--report", rep])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tpt (x): F =" in out and "pathway" in out
    text = open(os.path.join(rep, "report.md")).read()
    assert "Transition-path theory" in text
    assert os.path.exists(os.path.join(rep, "reactive_flux.png"))


def test_analyze_tpt_streaming(tpt_xyz, capsys):
    rc = main(["analyze", tpt_xyz, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "512",
               "--tpt", "z:0.2"])
    assert rc == 0
    assert "tpt (z): F =" in capsys.readouterr().out


def test_tpt_spec_fails_fast(tpt_xyz):
    # malformed specs exit BEFORE the pipeline (no 'landmark basis:'
    # work happens — these run in milliseconds)
    for bad in ("q", "x:0.9", "x:abc", "x:0"):
        with pytest.raises(SystemExit, match="--tpt"):
            main(["analyze", tpt_xyz, "--mobile", "Li", "--tpt", bad])


def test_streaming_uncertainty_and_bottlenecks(xyz_file, capsys):
    """--uncertainty / --bottlenecks work on the streaming route even
    with no --out and no transform: both consume only the network's
    on-device jump-count matrix, never the spilled labels (review
    finding: they were silently dropped)."""
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--streaming", "--block-frames", "64",
               "--uncertainty", "16", "--bottlenecks"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "uncertainty (16 posterior draws)" in cap.out
    assert "bottlenecks: base percolation" in cap.out
    # and neither may be warned about as label-needing
    assert "--uncertainty" not in cap.err
    assert "--bottlenecks" not in cap.err


def test_report_transport_sections(xyz_file, tmp_path, capsys):
    """--report with the transport/statistics flags on: the Onsager,
    Relaxation and Finite-sampling-uncertainty sections render (coverage
    audit: these report branches were untested)."""
    pytest.importorskip("matplotlib")
    rpt = str(tmp_path / "rpt2")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--timestep", "1.0", "--temperature", "600",
               "--onsager", "Li:+1", "--relaxation", "1.57",
               "--uncertainty", "16", "--report", rpt])
    assert rc == 0
    assert "report written to" in capsys.readouterr().out
    text = open(os.path.join(rpt, "report.md")).read()
    assert "## Onsager transport" in text
    assert "sigma_Onsager" in text or "transference" in text
    assert "## Relaxation" in text and "tau_alpha" in text
    assert "## Finite-sampling uncertainty (16 posterior draws)" in text
    assert "p_ij_lo" in text

def test_run_tpt_skip_branches(capsys):
    """_run_tpt's guard rails: overlapping quantile groups skip before
    any TPT work; a TransitionPathAnalysis ValueError (no stationary
    mass on the source group) downgrades to a skip note, never a crash."""
    import argparse
    from sitator_tpu import SiteNetwork
    from sitator_tpu.cli import _run_tpt
    from sitator_tpu.core.structure import Structure

    structure = Structure(np.zeros((2, 3)), [16, 3], np.eye(3) * 10.0)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    # four sites at the SAME x: the low/high quantile groups coincide
    sn.centers = np.array([[5.0, 5.0, 1.0], [5.0, 1.0, 5.0],
                           [5.0, 9.0, 5.0], [5.0, 5.0, 9.0]])
    sn.add_site_attribute("occupancies", np.full(4, 0.25))
    args = argparse.Namespace(tpt="x", verbose=False)
    assert _run_tpt(args, sn) is None
    assert "skipped" in capsys.readouterr().err

    # distinct x, but the chain is absorbing at site 3: the source
    # group carries no stationary mass -> ValueError -> skip note
    sn2 = SiteNetwork(structure, np.array([1, 0], bool),
                      np.array([0, 1], bool))
    sn2.centers = np.array([[1.0, 5.0, 5.0], [4.0, 5.0, 5.0],
                            [6.0, 5.0, 5.0], [9.0, 5.0, 5.0]])
    sn2.add_site_attribute("occupancies", np.full(4, 0.25))
    n_ij = np.zeros((4, 4))
    n_ij[0, 1] = n_ij[1, 2] = n_ij[2, 3] = 5.0
    n_ij[3, 3] = 100.0  # absorbing sink
    sn2.add_edge_attribute("n_ij", n_ij)
    args2 = argparse.Namespace(tpt="x:0.3", verbose=False)
    assert _run_tpt(args2, sn2) is None
    assert "skipped" in capsys.readouterr().err


def test_vacancy_report_paths(capsys):
    """_print_vacancy_report: the O(F*V^3) huge-run guard skips with a
    warning; a run with real vacancies prints the identity summary."""
    import argparse
    from sitator_tpu import SiteNetwork, SiteTrajectory
    from sitator_tpu.cli import _print_vacancy_report
    from sitator_tpu.core.structure import Structure

    args = argparse.Namespace(verbose=False)

    class _SN:
        n_sites = 2000

    class _ST:
        site_network = _SN()
        n_mobile = 10
        n_frames = 10 ** 6

    _print_vacancy_report(args, _ST())
    assert "skipping --vacancies" in capsys.readouterr().err

    # a real single-vacancy exchange run prints the summary line
    rng = np.random.default_rng(3)
    S = 8
    centers = np.stack(np.meshgrid(*[np.arange(2)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3) * 3.0
    structure = Structure(np.zeros((S, 3)), [16] + [3] * (S - 1),
                          np.eye(3) * 6.0)
    mask = np.zeros(S, bool)
    mask[0] = True
    sn = SiteNetwork(structure, mask, ~mask)
    sn.centers = centers + 1.5
    site_of_ion = np.arange(1, S, dtype=np.int64)
    labels = np.empty((60, S - 1), np.int64)
    vac = 0
    for f in range(60):
        labels[f] = site_of_ion
        if rng.random() < 0.4:
            # swap the vacancy with a random occupied site
            i = rng.integers(0, S - 1)
            vac, site_of_ion[i] = int(site_of_ion[i]), vac
    st = SiteTrajectory(sn, labels)
    _print_vacancy_report(args, st)
    out = capsys.readouterr().out
    assert "vacancies:" in out and "identities" in out

def test_report_needs_matplotlib(xyz_file, tmp_path, monkeypatch):
    """--report fails fast (before any pipeline work) when matplotlib is
    absent."""
    monkeypatch.setitem(sys.modules, "matplotlib", None)
    with pytest.raises(SystemExit, match="matplotlib"):
        main(["analyze", xyz_file, "--mobile", "Li",
              "--report", str(tmp_path / "r")])


def test_report_failure_never_kills_the_run(xyz_file, tmp_path,
                                            monkeypatch, capsys):
    """A report-generation crash downgrades to a warning: the analysis
    (already saved) must never be lost to a figure bug."""
    import sitator_tpu.cli as cli_mod
    def _boom(args, st, objs):
        raise RuntimeError("synthetic figure crash")
    monkeypatch.setattr(cli_mod, "_write_report", _boom)
    out = str(tmp_path / "a.sites")
    rc = main(["analyze", xyz_file, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--out", out, "--report", str(tmp_path / "rpt")])
    assert rc == 0
    cap = capsys.readouterr()
    assert "report generation failed: synthetic figure crash" in cap.err
    assert os.path.exists(out + ".npz") or os.path.exists(out)


def test_sites_bv_multi_mobile_note_and_bad_tol(tmp_path, capsys):
    """BV screening notes that only the FIRST --mobile species is the
    scanned cation; an invalid tolerance exits with the sites: prefix."""
    a = 2 * (1.466 + 0.37 * np.log(6.0))
    basis = [(0, 0, 0), (.5, .5, 0), (.5, 0, .5), (0, .5, .5)]
    lines = ["data_t", f"_cell_length_a {a:.6f}",
             f"_cell_length_b {a:.6f}", f"_cell_length_c {a:.6f}",
             "_cell_angle_alpha 90", "_cell_angle_beta 90",
             "_cell_angle_gamma 90", "loop_", "_atom_site_type_symbol",
             "_atom_site_fract_x", "_atom_site_fract_y",
             "_atom_site_fract_z"]
    lines += [f"O {x} {y} {z}" for x, y, z in basis]
    cif = tmp_path / "host.cif"
    cif.write_text("\n".join(lines) + "\n")
    rc = main(["sites", str(cif), "--mobile", "Li", "Na",
               "--method", "bv", "--bv-mismatch-tol", "0.3"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "uses ONE cation" in cap.err and "Li" in cap.err
    with pytest.raises(SystemExit, match="sites: "):
        main(["sites", str(cif), "--mobile", "Li", "--method", "bv",
              "--bv-mismatch-tol", "-1"])


def test_diagnose_and_report_on_resolvable_chain(tpt_xyz, tmp_path,
                                                 capsys):
    """On the longer hopping fixture the site chain has >= 2 live sites
    and resolvable implied timescales: the full markovianity diagnose
    detail prints, and the report renders the Markovianity and barrier
    sections with their figures."""
    pytest.importorskip("matplotlib")
    rpt = str(tmp_path / "rpt")
    rc = main(["analyze", tpt_xyz, "--mobile", "Li",
               "--cutoff-midpoint", "4.0", "--cutoff-steepness", "3.0",
               "--temperature", "600", "--barriers",
               "--diagnose", "--report", rpt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "diagnose: markovianity —" in out
    # the detail branch, not the "n/a (fewer than two live sites)" one
    assert ("slowest timescale" in out
            or "slow mode decays within the lag grid" in out)
    text = open(os.path.join(rpt, "report.md")).read()
    assert "## Markovianity of the site chain" in text
    assert os.path.exists(os.path.join(rpt, "implied_timescales.png"))
    # Tie the report's barriers section to the SAME run's stdout signal:
    # if the barrier engine found sampled edges, the section and its
    # figure MUST render; if not, the section must be absent.
    if "density barriers: no edge with enough sampling" in out:
        assert "Pathway barriers" not in text
    else:
        assert "density barriers:" in out
        assert "## Pathway barriers (density route)" in text
        assert os.path.exists(os.path.join(rpt, "barriers.png"))
