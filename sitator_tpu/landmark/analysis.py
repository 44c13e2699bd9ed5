"""``LandmarkAnalysis`` — the core engine orchestrator (L4).

Reference parity: ``sitator/landmark/LandmarkAnalysis.py`` (SURVEY.md §3.2,
call stack §4.1).  The pipeline: static-lattice drift check → landmark
vectors (fused XLA/MXU kernel, :mod:`sitator_tpu.ops.landmark`) → peak
evening → normalization → pluggable clustering → occupancy filtering →
PBC-aware site centers → :class:`SiteTrajectory`.

TPU-native notes: frames are processed in fixed-size blocks through a single
jitted block function (static shapes; last block padded), so the same code
path serves the one-chip case and, via ``sitator_tpu.parallel``, frame-sharded
multi-chip meshes.  The landmark basis is the ``(n_static, n_landmarks)``
membership matrix of the seed network's Voronoi vertex sets.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from sitator_tpu.core.sitenet import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.landmark.cluster import get_backend
from sitator_tpu.ops import landmark as lmops
from sitator_tpu.ops.pbc import PBCCalculator
from sitator_tpu.util.errors import (
    InsufficientSitesError,
    StaticLatticeError,
    ZeroLandmarkError,
)

logger = logging.getLogger(__name__)


class LandmarkAnalysis:
    """Unsupervised landmark analysis: discover sites and assign every
    (frame, mobile ion) to one.

    Parameters (constructor-kwargs API, reference parity — SURVEY.md §6.6):

    cutoff_midpoint, cutoff_steepness : logistic landmark cutoff ``c(d) =
        1/(1+exp(steepness (d - midpoint)))`` (Å).  Calibration constants —
        the reference defaults are unverified (SURVEY.md §0 item 4).
    minimum_site_occupancy : drop discovered sites occupied less than this
        fraction of frames.
    peak_evening : 'none' | 'clip' — flatten landmark-vector peaks before
        clustering.
    weighted_site_positions : weight site centers by assignment confidence.
    check_for_zero_landmarks : raise :class:`ZeroLandmarkError` if any ion
        sees no landmark (else warn).
    static_movement_threshold : max drift (Å) of any static atom before
        :class:`StaticLatticeError`.
    max_mobile_per_site : log a warning if more ions share a site in a frame.
    clustering_algorithm : backend name ('dotprod') or module.
    clustering_params : dict passed to the backend.
    batch_frames : frames per device block.
    """

    def __init__(self,
                 cutoff_midpoint=3.0,
                 cutoff_steepness=4.0,
                 cutoff_shape="logistic",
                 minimum_site_occupancy=0.01,
                 peak_evening="none",
                 weighted_site_positions=True,
                 check_for_zero_landmarks=True,
                 static_movement_threshold=1.0,
                 max_mobile_per_site=1,
                 dynamic_lattice_mapping=False,
                 clustering_algorithm="dotprod",
                 clustering_params=None,
                 batch_frames=256,
                 mesh=None,
                 verbose=True):
        if dynamic_lattice_mapping:
            # reference ⚠ feature (SURVEY.md §3.2): re-map the landmark
            # basis when static atoms EXCHANGE lattice sites.  Vertex
            # positions here are already instantaneous per frame (thermal
            # motion is handled); site-exchange remapping is not yet built.
            raise NotImplementedError(
                "dynamic_lattice_mapping (static-atom site exchange) is not "
                "implemented; instantaneous vertex positions already follow "
                "thermal motion")
        self.cutoff_midpoint = float(cutoff_midpoint)
        self.cutoff_steepness = float(cutoff_steepness)
        self.cutoff_shape = cutoff_shape
        self.minimum_site_occupancy = float(minimum_site_occupancy)
        self.peak_evening = peak_evening
        self.weighted_site_positions = bool(weighted_site_positions)
        self.check_for_zero_landmarks = bool(check_for_zero_landmarks)
        self.static_movement_threshold = float(static_movement_threshold)
        self.max_mobile_per_site = max_mobile_per_site
        self.clustering_algorithm = clustering_algorithm
        self.clustering_params = dict(clustering_params or {})
        self.batch_frames = int(batch_frames)
        self.mesh = mesh  # optional 1-D frame mesh: blocks shard over it
        self.verbose = verbose
        self._landmark_vectors = None
        self._landmark_dimension = None

    # reference parity: exposed after run()
    @property
    def landmark_vectors(self):
        if self._landmark_vectors is None:
            raise ValueError("LandmarkAnalysis has not been run")
        return self._landmark_vectors

    @property
    def landmark_dimension(self):
        if self._landmark_dimension is None:
            raise ValueError("LandmarkAnalysis has not been run")
        return self._landmark_dimension

    def run(self, sn: SiteNetwork, frames) -> SiteTrajectory:
        frames = np.asarray(frames)
        if frames.ndim != 3 or frames.shape[1] != sn.structure.n_atoms \
                or frames.shape[2] != 3:
            raise ValueError("frames must be (n_frames, n_atoms, 3)")
        if not sn.has_vertices:
            raise ValueError(
                "input SiteNetwork has no vertices — run VoronoiSiteGenerator"
                " (or provide landmark polyhedra) first")
        n_frames = frames.shape[0]
        mobile_idx = np.flatnonzero(sn.mobile_mask)
        static_idx = np.flatnonzero(sn.static_mask)
        n_mobile, n_static = len(mobile_idx), len(static_idx)
        n_landmarks = sn.n_sites
        self._landmark_dimension = n_landmarks

        cell = sn.structure.cell.astype(np.float32)
        cell_j = jnp.asarray(cell)
        cell_inv_j = jnp.asarray(np.linalg.inv(sn.structure.cell),
                                 dtype=jnp.float32)
        verts, vmask = sn.padded_vertices()
        A = lmops.vertex_membership_matrix(verts, vmask, n_static)
        static_ref = jnp.asarray(
            sn.structure.positions[static_idx], dtype=jnp.float32)

        mode = self.peak_evening

        @jax.jit
        def block_fn(mobile, static):
            lv = lmops.landmark_vectors(
                mobile, static, A, cell_j, cell_inv_j,
                self.cutoff_midpoint, self.cutoff_steepness,
                cutoff_shape=self.cutoff_shape)
            lv = lmops.peak_even(lv, mode)
            lv_n, norms = lmops.normalize_landmark_vectors(lv)
            drift = lmops.max_static_drift(static, static_ref, cell_j,
                                           cell_inv_j)
            return lv_n, norms, drift

        # -- blockwise landmark computation (fixed shapes; pad last block) --
        B = min(self.batch_frames, n_frames)
        sharding = None
        if self.mesh is not None:
            from sitator_tpu.parallel.mesh import frame_sharding
            n_dev = self.mesh.devices.size
            B = max(B // n_dev, 1) * n_dev  # blocks divide the mesh
            sharding = frame_sharding(self.mesh)
        lv_all = np.empty((n_frames, n_mobile, n_landmarks), dtype=np.float32)
        n_zero = 0
        first_zero = None
        max_drift = 0.0
        from sitator_tpu.util.progress import get_progress_bar
        blocks = get_progress_bar(range(0, n_frames, B),
                                  enabled=self.verbose,
                                  desc="landmark vectors", unit="block")
        for lo in blocks:
            hi = min(lo + B, n_frames)
            blk = frames[lo:hi]
            if hi - lo < B:  # pad to the jitted block shape
                pad = np.broadcast_to(blk[-1:], (B - (hi - lo),) +
                                      blk.shape[1:])
                blk = np.concatenate([blk, pad], axis=0)
            mobile = jnp.asarray(blk[:, mobile_idx], dtype=jnp.float32)
            static = jnp.asarray(blk[:, static_idx], dtype=jnp.float32)
            if sharding is not None:
                mobile = jax.device_put(mobile, sharding)
                static = jax.device_put(static, sharding)
            lv_n, norms, drift = block_fn(mobile, static)
            lv_all[lo:hi] = np.asarray(lv_n)[: hi - lo]
            zn = np.asarray(norms)[: hi - lo] == 0
            if zn.any():
                n_zero += int(zn.sum())
                if first_zero is None:
                    f, m = np.argwhere(zn)[0]
                    first_zero = (int(lo + f), int(m))
            max_drift = max(max_drift, float(drift))

        if max_drift > self.static_movement_threshold:
            raise StaticLatticeError(
                f"a static-lattice atom drifted {max_drift:.3f} Å "
                f"(> threshold {self.static_movement_threshold} Å); the host "
                "lattice moved too much for landmark analysis",
                max_drift=max_drift)
        if n_zero:
            msg = (f"{n_zero} (frame, ion) samples "
                   f"({100.0 * n_zero / (n_frames * n_mobile):.3f}%) saw no "
                   f"landmark (first at frame {first_zero[0]}, mobile ion "
                   f"{first_zero[1]}); widen cutoff_midpoint or check masks")
            if self.check_for_zero_landmarks:
                raise ZeroLandmarkError(msg, frame=first_zero[0],
                                        mobile_index=first_zero[1])
            logger.warning(msg)

        self._landmark_vectors = lv_all.reshape(n_frames * n_mobile,
                                                n_landmarks)

        # -- clustering ----------------------------------------------------
        backend = get_backend(self.clustering_algorithm)
        min_samples = max(1, int(np.ceil(
            self.minimum_site_occupancy * n_frames)))
        counts, labels, confs, centers_vec = backend.do_landmark_clustering(
            self._landmark_vectors, self.clustering_params, min_samples,
            verbose=self.verbose)
        n_sites = len(counts)
        if n_sites == 0:
            raise InsufficientSitesError(
                "clustering found no sites above minimum_site_occupancy "
                f"({self.minimum_site_occupancy}); lower it or adjust the "
                "cutoff/clustering thresholds")
        if self.verbose:
            logger.info("LandmarkAnalysis: %d sites from %d landmarks "
                        "(%.2f%% unassigned)", n_sites, n_landmarks,
                        100.0 * np.mean(labels < 0))

        # -- site centers: PBC-aware (weighted) mean of member positions ---
        calc = PBCCalculator(sn.structure.cell)
        flat_pos = frames[:, mobile_idx, :].reshape(-1, 3)
        w = confs if self.weighted_site_positions else None
        site_centers = np.empty((n_sites, 3))
        for k in range(n_sites):
            members = labels == k
            site_centers[k] = calc.average(
                flat_pos[members], None if w is None else w[members])

        # -- assemble the output network -----------------------------------
        out = SiteNetwork(sn.structure, sn.static_mask, sn.mobile_mask)
        out.centers = site_centers
        # landmark provenance: each site inherits the vertex polyhedron of
        # its dominant landmark (reference: vertices from landmark identity)
        dominant = np.argmax(centers_vec, axis=1)
        out.vertices = [sn.vertices[d] for d in dominant]
        out.add_site_attribute("dominant_landmark",
                               dominant.astype(np.int32))

        traj = labels.reshape(n_frames, n_mobile)
        confs2 = confs.reshape(n_frames, n_mobile)
        st = SiteTrajectory(out, traj, confs2)
        st.set_real_traj(frames)

        if self.max_mobile_per_site is not None:
            self._check_multiple_occupancy(traj, n_sites, n_frames)
        return st

    def _check_multiple_occupancy(self, traj, n_sites, n_frames):
        ok = traj >= 0
        flat = traj.astype(np.int64) + n_sites * np.arange(n_frames)[:, None]
        counts = np.bincount(flat[ok].ravel(), minlength=n_sites * n_frames)
        n_viol = int(np.sum(counts > self.max_mobile_per_site))
        if n_viol:
            logger.warning(
                "%d (frame, site) occupancies exceed max_mobile_per_site=%d "
                "— sites may be under-resolved (consider lowering merge "
                "thresholds)", n_viol, self.max_mobile_per_site)
