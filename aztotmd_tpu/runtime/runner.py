"""The run orchestrator — the TPU-native replacement for the reference's
host-driven per-step kernel schedule + buffered stat flush
(reference: src/main.cu:281-463).

Steps execute in jitted `lax.scan` chunks sized to the greatest common
divisor of all active sampling periods, so every sampling step lands on
a chunk boundary; the only host<->device traffic is the per-chunk scalar
pull (the analog of the reference's buffered stat flush, cuStat.cu:40-71)
and the rare trajectory/RDF snapshots.
"""

from __future__ import annotations

import math
import os
import sys
import time

import jax
import numpy as np

from ..io.control import TSTAT_RADI
from ..ops import rdf as ops_rdf
from ..output import writers as W
from . import statring
from .checkpoint import save_checkpoint
from .step import make_multi_step


def _gcd_all(values):
    g = 0
    for v in values:
        if v and v > 0:
            g = math.gcd(g, int(v))
    return g


class MDRunner:
    """Drive a loaded system to completion with full observability."""

    def __init__(self, sysd: dict, out_dir: str = ".", quiet: bool = False,
                 checkpoint_every: int = 0, profile: bool = False,
                 debug: bool = False, append: bool = False,
                 mesh_devices: int = 0, mesh_mode: str = "slab"):
        self.cfg = sysd["cfg"]
        self.mesh = None
        self._atoms_mesh = None
        if mesh_devices and mesh_mode == "slab":
            # slab decomposition over a device mesh (parallel/slab.py):
            # the deck's cfg is re-gridded to the 27-point block stencil
            # with ncx divisible by the mesh, the state is distributed
            # by x-slab, and the whole step loop runs sharded
            from ..parallel import make_mesh
            from ..parallel import slab as _slab
            self.cfg = _slab.prepare_slab_cfg(self.cfg, mesh_devices)
            sysd = dict(sysd, cfg=self.cfg)
            self.mesh = make_mesh(mesh_devices, axis="x")
        elif mesh_devices:
            # atom-sharded mode (parallel/mesh.py): per-atom arrays are
            # sharded over the mesh and XLA propagates the shardings
            # through the UNCHANGED programs (all-gathers for the cell
            # tables, psums for reductions).  Covers the FULL feature
            # set incl. reactive topology — the scaling trade-off vs
            # slab mode is replicated cell machinery
            if mesh_mode != "atoms":
                raise ValueError(f"unknown mesh_mode {mesh_mode!r} "
                                 "(use 'slab' or 'atoms')")
            if self.cfg.n_at % mesh_devices:
                raise ValueError(
                    f"n_at={self.cfg.n_at} not divisible by mesh size "
                    f"{mesh_devices} (atom-sharded mode needs equal "
                    "shards)")
            from ..parallel import make_mesh
            self._atoms_mesh = make_mesh(mesh_devices)
        self.ff = sysd["ff"]
        self.state = sysd["state"]
        self.aux = sysd["aux"]
        self.ctl = sysd["ctl"]
        self.fld = sysd["fld"]
        self.atoms = sysd["atoms"]
        self.out_dir = out_dir
        self.quiet = quiet
        self.checkpoint_every = checkpoint_every
        os.makedirs(out_dir, exist_ok=True)

        cfg, ctl, fld = self.cfg, self.ctl, self.fld

        # host-side copies for writer init: pulling state leaves back
        # from the device here costs a tunnel round trip each (and d2h
        # readback can stall for minutes when the tunnel is congested);
        # everything needed at init is still on the host in sysd
        types_h = np.array([fld.spec_id(nm) for nm in self.atoms.names],
                           dtype=np.int32)
        pos_h = np.asarray(self.atoms.pos, np.float64)
        vel_h = np.asarray(sysd.get("vel0")) if sysd.get("vel0") is not None \
            else np.zeros_like(pos_h)

        # --- sampling periods (0 = off) ---
        self.p_stat = ctl.stat
        self.p_rdf = ctl.fr_rdf
        self.p_rdf_out = ctl.fr_rdf_out
        self.p_traj = ctl.fr_traj
        self.p_revcon = ctl.revcon
        # RDF accumulates ON DEVICE inside the jitted chunk, so the
        # chunk size only needs to divide the HOST-visible periods; each
        # host dispatch costs a tunnel round trip (~100 ms), so fewer,
        # larger chunks matter more than anything inside them
        periods = [self.p_stat, self.p_traj, self.p_revcon,
                   ctl.bindtraj_freq if ctl.bindtraj_nucl else 0,
                   ctl.hist, ctl.vaf, checkpoint_every]
        self.chunk = _gcd_all(periods) or 1000
        self.chunk = min(self.chunk, 1000)
        self.rdf_in_chunk = bool(ctl.fr_rdf and ctl.r_rdf > 0
                                 and self.chunk % ctl.fr_rdf == 0)
        if ctl.fr_rdf and not self.rdf_in_chunk:
            # fall back: align chunks to the RDF period on the host
            self.chunk = _gcd_all(periods + [ctl.fr_rdf]) or ctl.fr_rdf

        # --- writers ---
        radi = cfg.tstat_type == TSTAT_RADI
        j = lambda p: os.path.join(out_dir, p)
        self.w_stat = W.StatWriter(j("stat.dat"), fld, radi,
                                   cfg.use_bnd != 0, cfg.use_angl != 0,
                                   append=append)
        self.w_bnd = (W.BondStatWriter(j("stat_bnd.dat"), fld,
                                       append=append)
                      if cfg.use_bnd else None)
        self.w_msd = W.MsdWriter(j("msd.dat"), fld, append=append)
        self.w_jmp = (W.JumpWriter(j("jumps.dat"), append=append)
                      if cfg.ejtype else None)
        self.w_traj = (W.TrajWriter(j("traj.dat"), fld,
                                    types_h)
                       if self.p_traj else None)

        # bind-trajectory: all atoms of the named nucleus (sys_init.cpp:
        # 946-968; cuStat.cu:921-1097)
        self.w_bindtraj = None
        self.p_bindtraj = 0
        if ctl.bindtraj_nucl and ctl.bindtraj_freq:
            nid = {nm: i for i, nm in enumerate(fld.nnames)}
            k = nid.get(ctl.bindtraj_nucl)
            if k is not None:
                nucl_of = np.array([fld.species[t].nuclei
                                    for t in types_h])
                self.bindtraj_idx = np.flatnonzero(nucl_of == k)
                if len(self.bindtraj_idx):
                    self.p_bindtraj = ctl.bindtraj_freq
                    self.w_bindtraj = W.BindTrajWriter(
                        j("traj_bnd.dat"), len(self.bindtraj_idx))

        # serial-build extras: hist.dat, vaf.dat, displacement MSD
        # (main.cpp:61-181; out_md.cpp:12-30, 89-124, 536-583)
        self.p_hist = ctl.hist
        self.w_hist = W.HistWriter(j("hist.dat")) if ctl.hist else None
        self.p_vaf = ctl.vaf
        self.w_vaf = (W.VafWriter(j("vaf.dat"), fld,
                                  vel_h, types_h, cfg.n_spec)
                      if ctl.vaf else None)
        self.w_msdd = W.MsdDisplWriter(j("msd_d.dat"), fld,
                                       pos_h, types_h,
                                       cfg.box, cfg.n_spec)

        # --- RDF ---
        import jax.numpy as jnp
        m_min = min([sp.mass for sp in fld.species if sp.mass > 0],
                    default=0.0)
        self.rcfg = ops_rdf.make_rdf_config(ctl, cfg, pos=pos_h,
                                            m_min=m_min)
        self.rdf_count = 0
        # last written RDF window (hist, nhist, count): finalize's
        # rdf.dat falls back to it when the overfill reset just zeroed
        # the live histogram (the reference's final out_rdf always has a
        # partial window in flight; ours resets at dispatch granularity)
        self._rdf_last = None
        if self.rcfg is not None:
            self.hist, self.nhist = ops_rdf.zero_hist(self.rcfg)
            spec_nuclei = np.array([s.nuclei for s in fld.species],
                                   np.int32)
            nucl_number = np.zeros(max(cfg.n_nucl, 1), np.int64)
            for t in types_h:
                nucl_number[spec_nuclei[t]] += 1
            self._spec_nuclei = jnp.asarray(spec_nuclei)
            self._nucl_number = jnp.asarray(nucl_number.astype(np.int32))

        # --- on-device stat ring eligibility (statring.py) ---
        # every host-visible period must land on a stat boundary and the
        # RDF period must divide the stat period, so whole stat periods
        # (with their RDF sub-blocks) scan on device and the sample rows
        # come back as one batched flush per many periods
        self._host_periods = [p for p in
                              (self.p_traj, self.p_revcon, self.p_bindtraj,
                               self.p_hist, self.p_vaf, checkpoint_every,
                               self.p_rdf_out) if p]
        self.ring_ok = self.p_stat > 0 and all(
            p % self.p_stat == 0 for p in self._host_periods) \
            and not os.environ.get("AZTOTMD_NO_RING")
        self._ring_plan = {}
        if self.rcfg is not None and self.p_rdf:
            self.ring_ok = self.ring_ok and (self.p_stat % self.p_rdf == 0)
        if self.ring_ok:
            # dispatches target ~this many steps (tunnel round trips are
            # ~100 ms; the flush pipeline hides the host write time).
            # A deck-provided cuda.txt/tpu.txt `nstep stat` depth is
            # honored as the flush granularity (cuInit.cu:701-739).
            dev = sysd.get("dev")
            target = int(os.environ.get("AZTOTMD_RING_STEPS", "8000"))
            self.s_cap = max(1, min(512, target // self.p_stat or 1))
            if dev is not None and dev.nstep_stat != 10:
                self.s_cap = max(1, min(512, dev.nstep_stat))
            self._spec_counts0 = np.bincount(
                types_h, minlength=cfg.n_spec)
            (self._fsl, self._nf, self._isl, self._ni) = \
                statring.make_layout(cfg.n_spec, max(cfg.n_bond_types, 1))
            if self.rcfg is None:
                # dummy histograms keep the ring signature uniform
                self.hist = jnp.asarray(np.zeros((1,), np.float32))
                self.nhist = jnp.asarray(np.zeros((1,), np.float32))

        if self.mesh is not None and self.ring_ok:
            # the mesh ring's MSD term reads a replicated gid-keyed pos0
            # table; keep the host copy so capacity rebuilds can
            # re-derive the ring program without a device pull
            self._pos0_h = np.asarray(self.state.pos0)
        self.n_dispatch = 0      # step-advancing host dispatches (tests)
        self._build_programs()

        if self._atoms_mesh is not None:
            # place the state/ff shards; every jitted program picks the
            # shardings up from its inputs (scaling-book recipe)
            from ..parallel.mesh import shard_system
            self.state, self.ff, _, _ = shard_system(
                self._atoms_mesh, self.state, self.ff, cfg.n_at)

        if self.mesh is not None:
            # distribute the freshly-built (or resumed) MDState by
            # x-slab; keep the MDState template so checkpoints stay
            # mesh-independent (resume works single-chip or any mesh)
            from ..parallel import slab as _slab
            self._mdstate_template = self.state
            self._slab_cap_factor = 1.6
            self._slab_spec_number = np.bincount(
                types_h, minlength=cfg.n_spec).astype(np.int32)
            self.state = _slab.make_slab_state(
                cfg, self.state, self.mesh,
                cap_factor=self._slab_cap_factor)
            self._sview_cache = None

        from ..utils import StageTimer
        self.profile = profile
        self.debug = debug
        self.timer = StageTimer()
        self._t0 = time.time()

    # ------------------------------------------------------------------
    def _build_programs(self):
        """(Re)build all jitted programs from the current cfg — called at
        init and after a capacity auto-grow rebuild."""
        cfg, rcfg = self.cfg, self.rcfg
        if self.mesh is not None:
            from ..parallel import slab as _slab
            self.multi = _slab.make_slab_multi_step(cfg, self.aux,
                                                    self.mesh)
            if rcfg is not None:
                @jax.jit
                def _rdf_s(pos, types, spec_number, hist, nhist):
                    return ops_rdf.rdf_sample(
                        cfg, rcfg, pos, types, spec_number,
                        self._spec_nuclei, self._nucl_number, hist, nhist)
                self._rdf_fn = _rdf_s
            if rcfg is not None and self.rdf_in_chunk:
                # fused mesh chunk: per-slab partial RDF counts + one
                # psum per sample instead of a host gather per sample
                self._chunk_rdf_fn = _slab.make_slab_rdf_chunk(
                    cfg, rcfg, self.aux, self.mesh,
                    np.asarray(self._spec_nuclei),
                    np.asarray(self._nucl_number), self.p_rdf)
            if self.ring_ok:
                # mesh-mode on-device stat ring: same buffered-flush
                # cadence as single-chip (one dispatch per s_cap stat
                # periods) — without it every chunk pays a host round
                # trip + per-period scalar pulls (cuStat.cu:17-71)
                self._ring_fn = _slab.make_slab_ring(
                    cfg, self.aux, self.mesh, rcfg,
                    (np.asarray(self._spec_nuclei)
                     if rcfg is not None else None),
                    (np.asarray(self._nucl_number)
                     if rcfg is not None else None),
                    self.p_stat, self.p_rdf if rcfg is not None else 0,
                    self._spec_counts0, self._pos0_h)
            return
        self.multi = make_multi_step(cfg, self.aux, donate=True)

        if rcfg is not None:
            @jax.jit
            def _rdf(pos, types, spec_number, hist, nhist):
                return ops_rdf.rdf_sample(cfg, rcfg, pos, types,
                                          spec_number, self._spec_nuclei,
                                          self._nucl_number, hist, nhist)
            self._rdf_fn = _rdf

        if rcfg is not None and self.rdf_in_chunk:
            # fused chunk: scan fr_rdf-step blocks, accumulating the
            # RDF histogram on device at each block boundary — one
            # host dispatch per chunk instead of one per RDF sample
            base = self.multi
            p_rdf = self.p_rdf

            def chunk_fn(state, hist, nhist, ff, n: int):
                n_blocks, rem = divmod(n, p_rdf)

                def body(carry, _):
                    s, h, nh = carry
                    s = base(s, ff, p_rdf)
                    h, nh = ops_rdf.rdf_sample(
                        cfg, rcfg, s.pos, s.types, s.spec_number,
                        self._spec_nuclei, self._nucl_number, h, nh)
                    return (s, h, nh), None

                if n_blocks:
                    (state, hist, nhist), _ = jax.lax.scan(
                        body, (state, hist, nhist), None,
                        length=n_blocks)
                if rem:
                    state = base(state, ff, rem)
                return state, hist, nhist

            self._chunk_rdf_fn = jax.jit(chunk_fn, static_argnums=4)

        if self.ring_ok:
            base = make_multi_step(cfg, self.aux, jit=False)
            stat_row = statring.make_stat_row(cfg, self._spec_counts0)
            p_stat, p_rdf = self.p_stat, self.p_rdf
            fuse_rdf = rcfg is not None and bool(p_rdf)
            use_list = bool(fuse_rdf and rcfg.k_cap > 0)
            # two-level Verlet interplay: make_multi_step starts every
            # call with a FULL rebuild (outer + inner), which is the
            # expensive candidate pass.  When the RDF sub-blocks are
            # short enough, do ONE full rebuild per stat period here
            # and only the cheap inner refine per sub-block.
            refine_blocks = bool(
                fuse_rdf and cfg.pair_engine == "neighbor"
                and cfg.nb_outer > 1 and p_rdf <= cfg.nb_rebuild
                and p_stat <= cfg.nb_outer * cfg.nb_rebuild)
            if refine_blocks:
                from .step import (make_step, refine_neighbors_state,
                                   rebuild_neighbors_state)
                step1 = make_step(cfg, self.aux, nbr_auto_rebuild=False)

                def base_refine(s, ff, n: int):
                    s = refine_neighbors_state(cfg, s)

                    def inner(s_, _):
                        return step1(s_, ff), None
                    s, _ = jax.lax.scan(inner, s, None, length=n)
                    return s
            if use_list:
                # amortize the candidate pass: one (N, k_cap) RDF
                # neighbor list per stat period, skin-padded to absorb
                # the drift, shared by all samples inside the period
                from ..ops.neighbors import (build_neighbors,
                                             build_neighbors_keys,
                                             prefix_refine,
                                             sorted_build_ok)
                lcfg = ops_rdf.rdf_list_cfg(cfg, rcfg)
                use_sorted = sorted_build_ok(lcfg)

            # when the RDF list's reach covers the outer Verlet reach,
            # ONE full candidate pass serves both: the outer list is a
            # top-k refine of the RDF list (saves the second ~40 ms
            # pass per stat period)
            rdf_covers_outer = bool(
                refine_blocks and use_list
                and math.sqrt(rcfg.r2_max) + rcfg.skin
                >= cfg.r_max + cfg.nb_skin2)
            if rdf_covers_outer:
                import dataclasses as _dc
                from ..ops.neighbors import refine_neighbors
                ocfg_view = _dc.replace(cfg, n_neigh=cfg.n_neigh2,
                                        nb_skin=cfg.nb_skin2)

            # The OPPOSITE regime (dilute decks tuned with a deep outer
            # window, e.g. cs1 with nb_skin2 = nb_outer*nb_skin): the
            # outer Verlet list's reach exceeds the RDF reach by enough
            # skin that it serves rdf_sample_list DIRECTLY for k
            # consecutive stat periods after one full rebuild — no
            # per-period RDF candidate pass (34 ms at 40k atoms), and
            # the ~59 ms outer rebuild amortizes over k periods.  The
            # cadence is a STATIC nested scan (superblocks of k
            # periods, rebuild at superblock start): a data-dependent
            # lax.cond may execute BOTH branches on TPU (step.py:42).
            # Soundness: per-step pair drift is bounded by
            # nb_skin/nb_rebuild (the sizing rule that set nb_skin2 =
            # nb_outer*nb_skin), so pairs within r_rdf at any sample in
            # the superblock were within r_rdf + rho*k*p_stat <=
            # r_max + nb_skin2 at build time, i.e. in the list
            # (truncation is monitored via nbr2_over -> auto-grow).
            rdf_from_outer = False
            k_super = 1
            if refine_blocks and use_list and not rdf_covers_outer:
                rho = cfg.nb_skin / max(cfg.nb_rebuild, 1)
                slack = (cfg.r_max + cfg.nb_skin2
                         - math.sqrt(rcfg.r2_max))
                k_rdf = int(slack / (rho * p_stat)) if slack > 0 else 0
                k_force = (cfg.nb_outer * cfg.nb_rebuild) // p_stat
                k_super = min(k_rdf, k_force)
                rdf_from_outer = k_super >= 1
            # Row-compacted RDF sampling (round 5): in rdf_from_outer
            # mode every sample walked the full (N, K2) outer list, but
            # at dilute densities most rows have no entry within
            # r_rdf + one-period drift (cs1: ~60% empty at the 19 A
            # refine reach; the 16 samples x 4.8 ms gather per
            # superblock were the biggest ring-overhead item, round-5
            # attribution).  One rdf_refine_rows per stat period
            # compacts to (rowcap, 1 + rowk); truncation is monitored
            # through the packed rdf_over slot and regrown in
            # _check_overflow.
            rdf_rows = False
            rdf_reach = 0.0
            if rdf_from_outer:
                rho = cfg.nb_skin / max(cfg.nb_rebuild, 1)
                rdf_reach = math.sqrt(rcfg.r2_max) + rho * p_stat
                if not hasattr(self, "_rdf_rowcap"):
                    from ..core.config import _neigh_stats, _round_up
                    mx, frac = _neigh_stats(self.atoms.pos, cfg.box,
                                            rdf_reach)
                    # headroom: occupied-row count fluctuates like a
                    # binomial (sigma ~ sqrt(N) at these fractions), so
                    # a few-sigma + constant pad suffices — a fat 1.5x
                    # multiplier pushed cs1 over the 70% gate for no
                    # benefit (the monitor regrows on real overflow)
                    self._rdf_rowcap = min(
                        cfg.n_at,
                        _round_up(int(frac * cfg.n_at)
                                  + 6 * int(math.sqrt(cfg.n_at)) + 512,
                                  256))
                    self._rdf_rowk = max(4, min(
                        cfg.n_neigh2, _round_up(mx + mx // 2 + 4, 4)))
                # EXPERIMENTAL, opt-in: measured a net LOSS on cs1
                # (2654 vs 3037 steps/s e2e, round 5) — the in-scan
                # full-list rdf_sample_list fuses into the superblock
                # well enough that the per-period refine + compact
                # walk costs more than the gather it saves.  Also a
                # ~5% loss on the 27x-dilute deck (2147 vs 2254
                # steps/s warm e2e, tools/make_dilute_deck.py), so no
                # known workload wins; kept behind the env flag (with
                # bitwise-equality tests) purely as a measured design
                # point.  Enable with AZTOTMD_RDF_ROWS=1.
                rdf_rows = (cfg.n_at >= 4096
                            and self._rdf_rowcap <= (7 * cfg.n_at) // 10
                            and cfg.n_neigh2 <= 1023
                            and bool(os.environ.get("AZTOTMD_RDF_ROWS")))
            self._rdf_rows_on = rdf_rows
            rdf_rowcap = getattr(self, "_rdf_rowcap", 0)
            rdf_rowk = getattr(self, "_rdf_rowk", 0)
            self._ring_plan = {
                "refine_blocks": refine_blocks,
                "rdf_covers_outer": rdf_covers_outer,
                "rdf_from_outer": rdf_from_outer,
                "k_super": k_super,
                "rdf_rows": rdf_rows,
                "rdf_rowcap": rdf_rowcap if rdf_rows else 0,
                "rdf_rowk": rdf_rowk if rdf_rows else 0,
            }

            def stat_block(s, h, nh, ff):
                if rdf_from_outer:
                    # nbr2_idx is fresh at superblock start (see ring)
                    # and constant through the period
                    if rdf_rows:
                        tbl, rover = ops_rdf.rdf_refine_rows(
                            cfg, rcfg, s.pos, s.nbr2_idx, rdf_reach,
                            rdf_rowcap, rdf_rowk)
                        s = s.replace(rdf_over=jax.numpy.maximum(
                            s.rdf_over, rover))
                    else:
                        nbr = s.nbr2_idx

                    def body(c, _):
                        s, h, nh = c
                        s = base_refine(s, ff, p_rdf)
                        if rdf_rows:
                            h, nh = ops_rdf.rdf_sample_rows(
                                cfg, rcfg, s.pos, s.types, s.spec_number,
                                self._spec_nuclei, self._nucl_number,
                                tbl, h, nh)
                        else:
                            h, nh = ops_rdf.rdf_sample_list(
                                cfg, rcfg, s.pos, s.types, s.spec_number,
                                self._spec_nuclei, self._nucl_number,
                                nbr, h, nh)
                        return (s, h, nh), None
                    (s, h, nh), _ = jax.lax.scan(
                        body, (s, h, nh), None, length=p_stat // p_rdf)
                    return s, h, nh
                if fuse_rdf:
                    if use_list:
                        # counts beyond k_cap are truncated (farthest-
                        # first on the sorted path) and when
                        # rdf_covers_outer the pair-force outer list is
                        # refined FROM this list — monitor so
                        # _check_overflow can grow k_cap and rebuild
                        if use_sorted:
                            nbr, skey, nmax_rdf, _ = \
                                build_neighbors_keys(lcfg, s.pos)
                        else:
                            nbr, nmax_rdf, _ = build_neighbors(lcfg,
                                                               s.pos)
                        s = s.replace(rdf_over=jax.numpy.maximum(
                            s.rdf_over, nmax_rdf))
                    if rdf_covers_outer:
                        if use_sorted:
                            # sorted rows + build-time keys: the outer
                            # refine at the SAME positions is a prefix
                            # slice (saves the ~11 ms gather+top_k)
                            idx2, nmax2 = prefix_refine(
                                nbr, skey, cfg.r_max + cfg.nb_skin2,
                                cfg.n_neigh2, cfg.n_at)
                        else:
                            idx2, nmax2 = refine_neighbors(ocfg_view,
                                                           s.pos, nbr)
                        s = s.replace(
                            nbr2_idx=idx2,
                            nbr2_over=jax.numpy.maximum(s.nbr2_over,
                                                        nmax2))
                        # the first base_refine call re-derives the
                        # inner list from this fresh outer list
                    elif refine_blocks:
                        from .step import rebuild_neighbors_state as _rb
                        s = _rb(cfg, s)

                    def body(c, _):
                        s, h, nh = c
                        if refine_blocks:
                            s = base_refine(s, ff, p_rdf)
                        else:
                            s = base(s, ff, p_rdf)
                        if use_list:
                            h, nh = ops_rdf.rdf_sample_list(
                                cfg, rcfg, s.pos, s.types, s.spec_number,
                                self._spec_nuclei, self._nucl_number,
                                nbr, h, nh)
                        else:
                            h, nh = ops_rdf.rdf_sample(
                                cfg, rcfg, s.pos, s.types, s.spec_number,
                                self._spec_nuclei, self._nucl_number,
                                h, nh)
                        return (s, h, nh), None
                    (s, h, nh), _ = jax.lax.scan(
                        body, (s, h, nh), None, length=p_stat // p_rdf)
                else:
                    s = base(s, ff, p_stat)
                return s, h, nh

            def ring(s, h, nh, ff, n_samples: int):
                def body(c, _):
                    s, h, nh = c
                    s, h, nh = stat_block(s, h, nh, ff)
                    return (s, h, nh), stat_row(s)
                if rdf_from_outer:
                    from .step import rebuild_neighbors_state as _rbs
                    jnp = jax.numpy
                    k = min(k_super, n_samples)
                    n_sup, rem = divmod(n_samples, k)

                    def sup(c, _):
                        s, h, nh = c
                        s = _rbs(cfg, s)
                        (s, h, nh), rows = jax.lax.scan(
                            body, (s, h, nh), None, length=k)
                        return (s, h, nh), rows
                    frs, irs = [], []
                    if n_sup:
                        (s, h, nh), (fr, ir) = jax.lax.scan(
                            sup, (s, h, nh), None, length=n_sup)
                        frs.append(fr.reshape((n_sup * k,)
                                              + fr.shape[2:]))
                        irs.append(ir.reshape((n_sup * k,)
                                              + ir.shape[2:]))
                    if rem:
                        s = _rbs(cfg, s)
                        (s, h, nh), (fr, ir) = jax.lax.scan(
                            body, (s, h, nh), None, length=rem)
                        frs.append(fr)
                        irs.append(ir)
                    frows = (jnp.concatenate(frs) if len(frs) > 1
                             else frs[0])
                    irows = (jnp.concatenate(irs) if len(irs) > 1
                             else irs[0])
                    return s, h, nh, frows, irows
                (s, h, nh), (frows, irows) = jax.lax.scan(
                    body, (s, h, nh), None, length=n_samples)
                return s, h, nh, frows, irows

            self._ring_fn = jax.jit(ring, static_argnums=4,
                                    donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def run(self, n_steps: int | None = None):
        """Advance to `total` steps; Ctrl-C stops cleanly after the
        current chunk (the reference's Esc abort, main.cu:405-409,
        utils.cpp:8-21) — callers still get final outputs via
        finalize()."""
        cfg, ctl = self.cfg, self.ctl
        total = n_steps if n_steps is not None else ctl.n_step
        done = int(self.state.step)
        t_loop = time.perf_counter()
        try:
            self._run_loop(total, done)
        except KeyboardInterrupt:
            print(f"interrupted at step {int(self.state.step)}; writing "
                  "final outputs", file=sys.stderr)
        jax.block_until_ready(self.state.pos)
        if self.profile:
            wall = time.perf_counter() - t_loop
            n = max(total - done, 1)
            print(f"loop wall: {wall:.1f} s for {n} steps "
                  f"({n / wall:.1f} steps/s)", file=sys.stderr)
            print(self.timer.report(), file=sys.stderr)
        return self.state

    def _run_loop(self, total, done):
        if self.ring_ok:
            return self._run_loop_ring(total, done)
        profile = self.profile
        while done < total:
            n = min(self.chunk, total - done)
            if profile:
                # per-stage wall clock needs a device barrier per chunk —
                # only pay the (tunnel) round trip when profiling
                with self.timer.stage("steps", lambda: self.state.pos):
                    self._advance(n)
                done += n
                with self.timer.stage("sampling"):
                    self._sample(done)
            else:
                self._advance(n)
                done += n
                self._sample(done)
            if self.rcfg is not None and self.rdf_in_chunk \
                    and self.rdf_count > 500:
                self.hist, self.nhist = ops_rdf.zero_hist(self.rcfg)
                self.rdf_count = 0
            if self.debug and self.mesh is None:
                from .debug import assert_state_ok
                assert_state_ok(self.cfg, self.state)

    def _run_loop_ring(self, total, done):
        """On-device stat ring loop: scan s_cap stat periods per dispatch,
        emitting sample rows as the scan's stacked output; flush the
        previous dispatch's rows while the device runs the next one
        (the reference's write_stat ring + stat_iter flush,
        cuStat.cu:17-71, 387-404). Overflow reactions therefore lag one
        dispatch — same detect-after-the-fact semantics as before, wider
        window."""
        p = self.p_stat
        pending = None
        try:
            # n_samp is a STATIC scan length: every distinct value
            # compiles its own ring program, and a ring containing a
            # Mosaic kernel costs ~30 min per compile over the axon
            # tunnel (measured on cs2).  Pick ONE window size that
            # divides every host-event gap (gcd of the host periods,
            # the total, and the resume point, in samples), capped at
            # s_cap — every dispatch then reuses the same program.
            w = _gcd_all(list(self._host_periods) + [total, done])
            w_samp = (w // p) if (w and w % p == 0) else 1
            n_fix = max(d for d in range(1, min(self.s_cap, w_samp) + 1)
                        if w_samp % d == 0)
            while done < total:
                nxt = self._next_host_event(done, total)
                while (nxt - done) >= p:
                    n_samp = n_fix
                    self.n_dispatch += 1
                    if self.profile:
                        # assign INSIDE the stage so the barrier lands on
                        # the NEW state (the old one was donated; blocking
                        # on it measures dispatch enqueue, not the device)
                        with self.timer.stage("steps",
                                              lambda: self.state.pos):
                            out = self._ring_fn(self.state, self.hist,
                                                self.nhist, self.ff,
                                                n_samp)
                            self.state, self.hist, self.nhist, fr, ir = out
                    else:
                        out = self._ring_fn(self.state, self.hist,
                                            self.nhist, self.ff, n_samp)
                        self.state, self.hist, self.nhist, fr, ir = out
                    done += n_samp * p
                    if self.rcfg is not None and self.p_rdf:
                        self.rdf_count += n_samp * (p // self.p_rdf)
                    if pending is not None:
                        self._flush_rows(*pending)
                    pending = (fr, ir)
                    # overfill protection (rdf_iter, cuStat.cu:580-589):
                    # the reference writes the intermediate rdfN.dat
                    # BEFORE the >500 reset, so defer the reset when this
                    # dispatch lands exactly on an rdf-output boundary —
                    # _sample_rest writes the file, then we reset below
                    if (self.rcfg is not None and self.rdf_count > 500
                            and not (self.p_rdf_out
                                     and done % self.p_rdf_out == 0)):
                        self.hist, self.nhist = ops_rdf.zero_hist(self.rcfg)
                        self.rdf_count = 0
                if pending is not None:
                    self._flush_rows(*pending)
                    pending = None
                if done < nxt:
                    # tail shorter than one stat period (no sample row)
                    self._advance(nxt - done)
                    done = nxt
                if self.profile:
                    with self.timer.stage("host_events",
                                          lambda: self.state.pos):
                        self._sample_rest(done)
                else:
                    self._sample_rest(done)
                if self.rcfg is not None and self.rdf_count >= 500:
                    # post-event reset: every periodic rdfN.dat then
                    # covers one fresh <=500-sample window, matching the
                    # reference's steady state (reset fires on the 501st
                    # sample, i.e. just after its write)
                    self.hist, self.nhist = ops_rdf.zero_hist(self.rcfg)
                    self.rdf_count = 0
                if self.debug:
                    from .debug import assert_state_ok
                    assert_state_ok(self.cfg, self.state)
        finally:
            if pending is not None:
                self._flush_rows(*pending)

    def _next_host_event(self, done, total):
        nxt = total
        for p in self._host_periods:
            nxt = min(nxt, (done // p + 1) * p)
        return nxt

    def _flush_rows(self, frows, irows):
        """Decode one dispatch's sample rows into the stat writers."""
        if self.profile:
            with self.timer.stage("sampling"):
                self._flush_rows_impl(frows, irows)
        else:
            self._flush_rows_impl(frows, irows)

    def _flush_rows_impl(self, frows, irows):
        fr = np.asarray(frows)      # blocks until the dispatch finishes
        ir = np.asarray(irows)
        over = np.max(ir[:, self._isl["over"]], axis=0)
        if self.mesh is not None:
            # slab rows repurpose the over slots for the slab health
            # monitors (parallel/slab._make_local_stat_row)
            self._decode_rows(fr, ir)
            return self._check_slab_health(
                occ=int(over[0]), lost=int(over[1]), defer=int(over[2]),
                miss=int(over[3]))
        self._decode_rows(fr, ir)
        self._check_overflow(int(over[0]), int(over[1]), int(over[2]),
                             nbrow_over=int(over[3]),
                             nbr2_over=int(over[4]),
                             rdf_over=int(over[5]),
                             orow_over=int(over[6]))

    def _decode_rows(self, fr, ir):
        fsl, isl = self._fsl, self._isl
        nsp = self.cfg.n_spec
        for k in range(fr.shape[0]):
            f, i = fr[k], ir[k]
            step = int(i[isl["step"]][0])
            t = step * self.cfg.dt
            eng = dict(zip(statring.ENG_KEYS, f[fsl["eng"]].tolist()))
            press = float(f[fsl["press"]][0])
            n_bond = int(i[isl["nbond"]][0])
            self.w_stat.write_row(t, step, eng, f[fsl["pos_mom"]],
                                  f[fsl["neg_mom"]], press, i[isl["spec"]])
            cpos = i[isl["cpos"]].reshape(nsp, 3)
            cneg = i[isl["cneg"]].reshape(nsp, 3)
            if self.w_bnd:
                self.w_bnd.write_row(t, step, n_bond, i[isl["btc"]],
                                     f[fsl["bt_r"]], f[fsl["bt_lt"]])
            self.w_msd.write_row(t, step, cpos, cneg)
            if self.w_jmp:
                self.w_jmp.write_row(t, step, int(i[isl["njump"]][0]),
                                     int(i[isl["jpos"]][0]),
                                     int(i[isl["jneg"]][0]))
            self.w_msdd.write_row_msd(t, step, f[fsl["msd"]], cneg, cpos)
            if not self.quiet:
                self._console(step, eng, float(f[fsl["x1"]][0]), press,
                              n_bond)

    def _advance(self, n: int):
        self.n_dispatch += 1
        if self.rcfg is not None and self.rdf_in_chunk:
            self.state, self.hist, self.nhist = self._chunk_rdf_fn(
                self.state, self.hist, self.nhist, self.ff, n)
            self.rdf_count += n // self.p_rdf
            # overfill reset happens in the loop AFTER sampling — the
            # reference writes intermediate rdfN.dat before its >500
            # reset (rdf_iter, cuStat.cu:568-589)
        else:
            self.state = self.multi(self.state, self.ff, n)

    # ------------------------------------------------------------------
    def _sample(self, step: int):
        if self.p_stat and step % self.p_stat == 0:
            # build the (host-gathered, on a mesh) view only when a
            # period actually fires — an unconditional gather here cost
            # a full d2h of every per-atom array per CHUNK on mesh
            # runs — and only the positions: the other stat inputs are
            # replicated scalars (msd_d + console x1 need pos)
            st = self._sview(fields=("pos",))
            t = step * self.cfg.dt
            # ONE batched device->host fetch: each blocking scalar pull
            # over the axon tunnel costs a ~100 ms round trip; a dozen of
            # them per sample dominated dense-deck runs
            (E, pos_mom, neg_mom, pressure, spec_number, cross_pos,
             cross_neg, n_bond, bt_count, bt_r_mean, bt_lt_mean,
             n_jump, jump_pos, jump_neg, pos0_row, over) = jax.device_get(
                (st.energies, st.pos_mom, st.neg_mom, st.pressure,
                 st.spec_number, st.cross_pos, st.cross_neg, st.n_bond,
                 st.bt_count, st.bt_r_mean, st.bt_lt_mean, st.n_jump,
                 st.jump_pos, st.jump_neg, st.pos[0, 0],
                 (st.cell_overflow, st.nbr_over, st.nbr_viol,
                  st.rdf_over)))
            eng = {k: float(getattr(E, k)) for k in
                   ("tot", "kin", "vdw", "coul1", "coul2", "bond",
                    "angle", "temp")}
            self.w_stat.write_row(t, step, eng, pos_mom, neg_mom,
                                  float(pressure), spec_number)
            if self.w_bnd:
                self.w_bnd.write_row(t, step, int(n_bond), bt_count,
                                     bt_r_mean, bt_lt_mean)
            self.w_msd.write_row(t, step, cross_pos, cross_neg)
            if self.w_jmp:
                self.w_jmp.write_row(t, step, int(n_jump),
                                     int(jump_pos), int(jump_neg))
            self.w_msdd.write_row(t, step, np.asarray(st.pos),
                                  cross_neg, cross_pos)
            if not self.quiet:
                self._console(step, eng, float(pos0_row),
                              float(pressure), int(n_bond))
            self._check_overflow(int(over[0]), int(over[1]), int(over[2]),
                                 int(over[3]))
        self._sample_rest(step)

    def _sample_rest(self, step: int):
        """Non-stat sampling (hist/vaf/rdf/traj/revcon/checkpoint) — in
        ring mode these fire only at host-event boundaries."""
        _st = [None]

        def sv():
            # lazy: gather the view only for branches that fire
            if _st[0] is None:
                _st[0] = self._sview()
            return _st[0]

        if self.w_hist and step % self.p_hist == 0:
            st = sv()
            from .. import units
            i1 = 1 if self.cfg.n_at > 1 else 0
            (E, neg_mom, pos_mom, p1x, p1y) = jax.device_get(
                (st.energies, st.neg_mom, st.pos_mom,
                 st.pos[i1, 0], st.pos[i1, 1]))
            temp = 2.0 * float(E.kin) / (units.KB * max(self.cfg.deg_free, 1))
            q1 = float(self.ff.spec_charge[st.types[1]]) \
                if self.cfg.n_at > 1 else 0.0
            self.w_hist.write_row(
                step * self.cfg.dt, step, float(E.tot), temp,
                float(p1x), float(p1y), q1, neg_mom, pos_mom)

        if self.w_vaf and step % self.p_vaf == 0:
            self.w_vaf.write_row(step * self.cfg.dt, step,
                                 np.asarray(sv().vel))

        if self.rcfg is not None and self.p_rdf and not self.rdf_in_chunk \
                and not self.ring_ok and step % self.p_rdf == 0:
            # legacy per-step sampling; in ring mode the samples are
            # fused into the ring program (never double-sample here)
            st = sv()
            self.hist, self.nhist = self._rdf_fn(
                st.pos, st.types, st.spec_number, self.hist, self.nhist)
            self.rdf_count += 1
        if self.rcfg is not None and self.p_rdf_out \
                and step % self.p_rdf_out == 0:
            self._write_rdf(os.path.join(self.out_dir, f"rdf{step}.dat"))
        # overfill reset AFTER any intermediate write at this step — the
        # reference's rdf_iter order (cuStat.cu:568-589)
        if self.rcfg is not None and not self.rdf_in_chunk \
                and self.rdf_count > 500:
            self.hist, self.nhist = ops_rdf.zero_hist(self.rcfg)
            self.rdf_count = 0

        if self.w_traj and step >= self.ctl.st_traj \
                and step % self.p_traj == 0:
            st = sv()
            self.w_traj.write_row(step * self.cfg.dt, step,
                                  np.asarray(st.pos),
                                  np.asarray(st.types),
                                  np.asarray(st.parents))

        if self.w_bindtraj and step >= self.ctl.bindtraj_start \
                and step % self.p_bindtraj == 0:
            st = sv()
            self.w_bindtraj.write_row(step * self.cfg.dt, step,
                                      self.bindtraj_idx,
                                      np.asarray(st.pos),
                                      np.asarray(st.types),
                                      np.asarray(st.nbonds),
                                      np.asarray(st.parents), self.cfg.box)

        if self.p_revcon and step % self.p_revcon == 0:
            self._write_revcon(suffix=str(step))

        if self.checkpoint_every and step % self.checkpoint_every == 0:
            ck = self._slab_to_mdstate() if self.mesh is not None else sv()
            save_checkpoint(os.path.join(self.out_dir, "checkpoint.npz"),
                            ck, {"step": step})

    def _console(self, step, eng, x1, pressure, n_bond):
        parts = [f"{step} x1={x1:.2f}"]
        if self.cfg.elec_type:
            parts.append(f"C1={eng['coul1']:.3G}, C2={eng['coul2']:.3G}")
        if self.cfg.use_bnd == 2:
            parts.append(f"nBnd={n_bond}")
        if self.cfg.use_bnd:
            parts.append(f"bndEng={eng['bond']:.3G}")
        parts.append(f"Kin={eng['kin']:.3G} Vdw={eng['vdw']:.3G} "
                     f"Tot={eng['tot']:.3G} P={pressure:.0f}")
        if self.cfg.tstat_type == TSTAT_RADI:
            parts.append(f"U={eng['temp']:.3G}")
        print(" ".join(parts), flush=True)

    def _sview(self, fields=None):
        """Sampling/writer view of the state: the MDState itself on a
        single chip, or an MDState-shaped namespace assembled from the
        slab state (replicated scalars pass through as device arrays,
        per-atom arrays are gathered host-side in gid order)."""
        if self.mesh is None:
            return self.state
        from types import SimpleNamespace
        from ..parallel import slab as _slab
        st = self.state
        fields = tuple(fields or _slab.GATHER_FIELDS)
        step = int(st.step)
        if self._sview_cache is not None and \
                self._sview_cache[0] == step and \
                set(fields) <= self._sview_cache[2]:
            return self._sview_cache[1]
        cfg = self.cfg
        g = _slab.gather_state(st, cfg.n_at, fields)
        g = {k: g.get(k) for k in _slab.GATHER_FIELDS}
        z = np.zeros((), np.int32)
        nbt = max(cfg.n_bond_types, 1)
        rg = st.rg
        if rg is not None:
            n_bond = rg.n_bond
        elif cfg.use_bnd:
            n_bond = np.asarray(
                (np.count_nonzero(np.asarray(st.bnd_type)) + 1) // 2,
                np.int32)
        else:
            n_bond = z
        view = SimpleNamespace(
            energies=st.energies, pos_mom=st.pos_mom,
            neg_mom=st.neg_mom, pressure=st.pressure,
            spec_number=(rg.spec_number if rg is not None
                         else self._slab_spec_number),
            cross_pos=st.cross_pos, cross_neg=st.cross_neg,
            n_bond=n_bond,
            bt_count=(rg.bt_count if rg is not None
                      else np.zeros(nbt, np.int32)),
            bt_r_mean=(rg.bt_r_mean if rg is not None
                       else np.zeros(nbt, np.float32)),
            bt_lt_mean=(rg.bt_lt_mean if rg is not None
                        else np.zeros(nbt, np.float32)),
            n_jump=rg.n_jump if rg is not None else z,
            jump_pos=rg.jump_pos if rg is not None else z,
            jump_neg=rg.jump_neg if rg is not None else z,
            pos=g["pos"], vel=g["vel"], types=g["types"],
            engs=g["engs"], radii=g["radii"],
            parents=(rg.parents if rg is not None
                     else np.full(cfg.n_at, -1, np.int32)),
            nbonds=(rg.nbonds if rg is not None
                    else np.zeros(cfg.n_at, np.int32)),
            cell_overflow=st.slab_occ, nbr_over=z, nbr_viol=z,
            rdf_over=z, step=st.step)
        if rg is not None:
            # reactive topology: the live replicated tables
            view.bond_at1, view.bond_at2 = rg.bond_at1, rg.bond_at2
            view.bond_type = rg.bond_type
            view.ang_central, view.ang_lig1 = rg.ang_central, rg.ang_lig1
            view.ang_lig2, view.ang_type = rg.ang_lig2, rg.ang_type
            view.n_angle = rg.n_angle
        elif cfg.use_bnd or cfg.use_angl:
            # constant topology: the global tables never change, so the
            # finalize writers (revbonds/revangles/lengths) read them
            # from the initial MDState
            t = self._mdstate_template
            view.bond_at1, view.bond_at2 = t.bond_at1, t.bond_at2
            view.bond_type = t.bond_type
            view.ang_central, view.ang_lig1 = t.ang_central, t.ang_lig1
            view.ang_lig2, view.ang_type = t.ang_lig2, t.ang_type
            view.n_angle = t.n_angle
        self._sview_cache = (step, view, set(fields))
        return view

    def _slab_to_mdstate(self):
        """Reassemble a full single-chip MDState from the slab state
        (mesh-independent checkpoints + capacity-rebuild redistribution)."""
        import jax.numpy as jnp
        from ..parallel import slab as _slab
        st = self.state
        g = _slab.gather_state(st, self.cfg.n_at)
        npdt = np.dtype(self.cfg.jnp_dtype)
        t = self._mdstate_template
        if st.rg is not None:
            # reactive decks: the live replicated topology supersedes
            # the template's initial tables (types come from the
            # gathered slots, which local_step keeps in sync)
            from ..parallel.slab_react import merge_into_state
            t = merge_into_state(t, st.rg)
        return t.replace(
            pos=jnp.asarray(g["pos"].astype(npdt)),
            vel=jnp.asarray(g["vel"].astype(npdt)),
            frc=jnp.asarray(g["frc"].astype(npdt)),
            engs=jnp.asarray(g["engs"].astype(npdt)),
            radii=jnp.asarray(g["radii"].astype(npdt)),
            types=jnp.asarray(g["types"]),
            # stale after redistribution: force a list rebuild
            nbr_ref=jnp.asarray(g["pos"].astype(npdt) + npdt.type(1e9)),
            rng=st.rng, step=st.step, chit=st.chit, consint=st.consint,
            energies=st.energies, pressure=st.pressure,
            pos_mom=st.pos_mom, neg_mom=st.neg_mom,
            mom_buf_pos=st.mom_buf_pos, mom_buf_neg=st.mom_buf_neg,
            i_mom=st.i_mom, cross_pos=st.cross_pos,
            cross_neg=st.cross_neg)

    def _check_slab_health(self, occ=None, lost=None, defer=None,
                           miss=None):
        """Slab-mode monitors (the mesh analog of _check_overflow):
        grow grid.cap when a cell overflows (rank >= cap atoms get no
        pair force), grow the slot/migration capacity and redistribute
        when migration ever deletes or defers atoms.  Values arrive
        pre-fetched from the ring rows in ring mode; device pulls
        otherwise."""
        import dataclasses
        st = self.state
        if occ is None:
            occ = int(st.slab_occ)
        if lost is None:
            lost = int(st.mig_lost)
        if defer is None:
            defer = int(st.mig_defer)
        cfg = self.cfg
        rebuild = False
        if occ > cfg.grid.cap:
            from ..core.config import CellGrid, _round_up
            new_cap = _round_up(occ + max(2, occ // 4), 4)
            print(f"WARNING: slab cell occupancy {occ} exceeded capacity "
                  f"{cfg.grid.cap}; rebuilding with cap={new_cap}",
                  file=sys.stderr)
            g = cfg.grid
            self.cfg = dataclasses.replace(
                cfg, grid=CellGrid(dims=g.dims, cap=new_cap,
                                   stencil=g.stencil, edge=g.edge))
            rebuild = True
        if miss is None:
            miss = int(st.bond_miss)
        if miss > getattr(self, "_bond_miss_seen", 0):
            print(f"WARNING: {miss} bond/angle records had partners "
                  "outside the +-1-slab reach (stretched topology; "
                  "their forces were dropped) — the trajectory is "
                  "suspect", file=sys.stderr)
            self._bond_miss_seen = miss
        seen = getattr(self, "_slab_mig_seen", (0, 0))
        if (lost, defer) > seen:
            self._slab_mig_seen = (lost, defer)
            if lost > seen[0]:
                print(f"WARNING: slab migration DELETED {lost - seen[0]} "
                      "atoms (receiver slots full); raising capacity and "
                      "redistributing", file=sys.stderr)
                self._slab_cap_factor *= 1.5
                rebuild = True
            elif defer > seen[1]:
                # escalating monitor: deferrals on K consecutive checks
                # mean the sender buffer is chronically undersized —
                # raise capacity and redistribute instead of re-warning
                hits = getattr(self, "_defer_hits", 0) + 1
                self._defer_hits = hits
                if hits == 1:
                    print(f"WARNING: {defer} deferred slab migrations so "
                          "far (sender buffer full); atoms retry next "
                          "step but sit out one pair pass",
                          file=sys.stderr)
                elif hits >= 3:
                    print(f"WARNING: migrations still deferring after "
                          f"{hits} checks ({defer} total); raising "
                          "capacity and redistributing", file=sys.stderr)
                    self._slab_cap_factor *= 1.5
                    rebuild = True
        if rebuild:
            from ..parallel import slab as _slab
            md = self._slab_to_mdstate()
            self._build_programs()
            self.state = _slab.make_slab_state(
                self.cfg, md, self.mesh,
                cap_factor=self._slab_cap_factor)
            self._sview_cache = None
            # the fresh state restarts its counters from zero
            self._slab_mig_seen = (0, 0)
            self._defer_hits = 0

    def _escalate_skin(self, viol):
        """Skin violations kept accruing after the first warning: grow
        nb_skin 1.5x (and n_neigh by the reach-volume ratio so the
        thicker list still fits), capped at the outer reach in two-level
        mode — there, fall back to halving nb_rebuild.  Bounded at 3
        reactions; after that re-warn with counts so the degradation is
        never silent."""
        import dataclasses
        from ..core.config import _round_up
        cfg = self.cfg
        grown = getattr(self, "_skin_grown", 0)
        self._viol_hits = 0
        if grown >= 3:
            print(f"WARNING: {viol} neighbor-skin violations and the "
                  "auto-escalation budget is spent; trajectory may miss "
                  "pairs — re-tune nb_skin/nb_rebuild", file=sys.stderr)
            return
        self._skin_grown = grown + 1
        old = cfg.nb_skin
        new = old * 1.5
        if cfg.nb_outer > 1:
            # the inner list is refined FROM the outer list: its reach
            # r_max + nb_skin must stay within r_max + nb_skin2
            new = min(new, cfg.nb_skin2)
        if new <= old + 1e-9:
            if cfg.nb_rebuild > 1:
                new_r = max(1, cfg.nb_rebuild // 2)
                print(f"WARNING: {viol} neighbor-skin violations keep "
                      f"accruing; shortening nb_rebuild "
                      f"{cfg.nb_rebuild} -> {new_r}", file=sys.stderr)
                self.cfg = dataclasses.replace(cfg, nb_rebuild=new_r)
                self._build_programs()
            else:
                print(f"WARNING: {viol} neighbor-skin violations with "
                      "nb_skin at the outer reach and per-step rebuilds; "
                      "re-tune nb_skin2/nb_outer", file=sys.stderr)
            return
        ratio = ((cfg.r_max + new) / (cfg.r_max + old)) ** 3
        new_k = _round_up(int(math.ceil(cfg.n_neigh * ratio)) + 4, 4)
        print(f"WARNING: {viol} neighbor-skin violations keep accruing; "
              f"growing nb_skin {old:.3f} -> {new:.3f} "
              f"(K {cfg.n_neigh} -> {new_k})", file=sys.stderr)
        self.cfg = dataclasses.replace(cfg, nb_skin=new, n_neigh=new_k)
        N = self.cfg.n_at
        extra = {}
        if self.cfg.nb_rowcap:
            extra["nbrow_idx"] = jax.numpy.asarray(
                np.full((self.cfg.nb_rowcap, 1 + new_k), N, np.int32))
        self.state = self.state.replace(
            nbr_idx=jax.numpy.asarray(np.full((N, new_k), N, np.int32)),
            nbr_ref=self.state.nbr_ref + 1e9,   # force rebuild
            **extra)
        self._build_programs()

    def _check_overflow(self, occ=None, nbr_over=None, nbr_viol=None,
                        rdf_over=None, nbrow_over=None, nbr2_over=None,
                        orow_over=None):
        if self.mesh is not None:
            return self._check_slab_health()
        """Monitored rebucket path: the reference corrupts memory on cell
        overflow (cuMDfunc.cu:264-265); we detect and rebuild.  The
        counters arrive pre-fetched from the batched sample pull."""
        import dataclasses
        if occ is None:
            occ = int(self.state.cell_overflow)
        if nbr_viol and self.cfg.pair_engine == "neighbor" \
                and nbr_viol > getattr(self, "_viol_seen", 0):
            # escalating monitor: warn on the first violation window,
            # REACT if violations keep accruing on later checks (a
            # monotonically degrading run must not degrade silently)
            self._viol_seen = nbr_viol
            self._viol_hits = getattr(self, "_viol_hits", 0) + 1
            if self._viol_hits == 1:
                print(f"WARNING: {nbr_viol} neighbor-skin violations so "
                      "far; will thicken nb_skin if they keep accruing",
                      file=sys.stderr)
            else:
                self._escalate_skin(nbr_viol)
        if self.cfg.pair_engine == "neighbor":
            over = int(self.state.nbr_over) if nbr_over is None \
                else nbr_over
            if over > self.cfg.n_neigh:
                from ..core.config import _round_up
                new_k = _round_up(over + max(4, over // 4), 4)
                print(f"WARNING: neighbor count {over} exceeded capacity "
                      f"{self.cfg.n_neigh}; rebuilding with K={new_k}",
                      file=sys.stderr)
                self.cfg = dataclasses.replace(self.cfg, n_neigh=new_k)
                N = self.cfg.n_at
                pad = np.full((N, new_k), N, np.int32)
                extra = {}
                if self.cfg.nb_rowcap:
                    # nbrow rows carry [atom id | K neighbor ids]
                    extra["nbrow_idx"] = jax.numpy.asarray(
                        np.full((self.cfg.nb_rowcap, 1 + new_k), N,
                                np.int32))
                self.state = self.state.replace(
                    nbr_idx=jax.numpy.asarray(pad),
                    nbr_ref=self.state.nbr_ref + 1e9,   # force rebuild
                    **extra)
                self._build_programs()
            if self.cfg.nb_rowcap:
                rover = int(self.state.nbrow_over) if nbrow_over is None \
                    else nbrow_over
                if rover > self.cfg.nb_rowcap:
                    from ..core.config import _round_up
                    new_cap = min(_round_up(rover + max(128, rover // 4),
                                            128), self.cfg.n_at)
                    print(f"WARNING: occupied-row count {rover} exceeded "
                          f"row capacity {self.cfg.nb_rowcap}; rebuilding "
                          f"with rowcap={new_cap}", file=sys.stderr)
                    self.cfg = dataclasses.replace(self.cfg,
                                                   nb_rowcap=new_cap)
                    N = self.cfg.n_at
                    padr = np.full((new_cap, 1 + self.cfg.n_neigh), N,
                                   np.int32)
                    self.state = self.state.replace(
                        nbrow_idx=jax.numpy.asarray(padr),
                        nbr_ref=self.state.nbr_ref + 1e9)
                    self._build_programs()
            if self.cfg.nb_orowcap:
                oover = int(self.state.orow_over) if orow_over is None \
                    else orow_over
                if oover > self.cfg.nb_orowcap:
                    from ..core.config import _round_up
                    new_cap = min(_round_up(oover + max(128, oover // 4),
                                            128), self.cfg.n_at)
                    print(f"WARNING: outer-occupied row count {oover} "
                          f"exceeded capacity {self.cfg.nb_orowcap}; "
                          f"rebuilding with orowcap={new_cap}",
                          file=sys.stderr)
                    self.cfg = dataclasses.replace(self.cfg,
                                                   nb_orowcap=new_cap)
                    pado = np.full((new_cap,), self.cfg.n_at, np.int32)
                    self.state = self.state.replace(
                        orow_idx=jax.numpy.asarray(pado),
                        nbr_ref=self.state.nbr_ref + 1e9)
                    self._build_programs()
            if self.cfg.nb_outer > 1:
                over2 = int(self.state.nbr2_over) if nbr2_over is None \
                    else nbr2_over
                if over2 > self.cfg.n_neigh2:
                    from ..core.config import _round_up
                    new_k2 = _round_up(over2 + max(4, over2 // 4), 8)
                    print(f"WARNING: outer neighbor count {over2} "
                          f"exceeded capacity {self.cfg.n_neigh2}; "
                          f"rebuilding with K2={new_k2}", file=sys.stderr)
                    self.cfg = dataclasses.replace(self.cfg,
                                                   n_neigh2=new_k2)
                    N = self.cfg.n_at
                    pad2 = np.full((N, new_k2), N, np.int32)
                    self.state = self.state.replace(
                        nbr2_idx=jax.numpy.asarray(pad2),
                        nbr_ref=self.state.nbr_ref + 1e9)
                    self._build_programs()
        # row-compacted RDF sampling (rdf_from_outer + rdf_rows mode):
        # rdf_over packs n_rows_needed * 1024 + max_entries_per_row
        # (ops/rdf.py:rdf_refine_rows).  The packed max can shadow a
        # smaller-row/larger-k window, but any persisting overflow is
        # re-reported by the next flush, so growth still converges.
        if getattr(self, "_rdf_rows_on", False):
            import dataclasses
            from ..core.config import _round_up
            rover = int(self.state.rdf_over) if rdf_over is None \
                else rdf_over
            rows_need, k_need = rover // 1024, rover % 1024
            grew = False
            if rows_need > self._rdf_rowcap:
                new_cap = min(_round_up(rows_need + max(256,
                                                        rows_need // 4),
                                        256), self.cfg.n_at)
                print(f"WARNING: RDF-occupied row count {rows_need} "
                      f"exceeded capacity {self._rdf_rowcap}; rebuilding "
                      f"with rdf_rowcap={new_cap}", file=sys.stderr)
                self._rdf_rowcap = new_cap
                grew = True
            if k_need > self._rdf_rowk:
                new_k = min(_round_up(k_need + max(4, k_need // 4), 4),
                            self.cfg.n_neigh2)
                print(f"WARNING: RDF per-row entry count {k_need} "
                      f"exceeded capacity {self._rdf_rowk}; rebuilding "
                      f"with rdf_rowk={new_k}", file=sys.stderr)
                self._rdf_rowk = new_k
                grew = True
            if grew:
                self._build_programs()
        # ring-mode RDF list capacity (first-K truncation would silently
        # drop in-range pairs — and pair forces too when the outer
        # Verlet list is refined from it)
        elif self.rcfg is not None and self.rcfg.k_cap > 0:
            rover = int(self.state.rdf_over) if rdf_over is None \
                else rdf_over
            if rover > self.rcfg.k_cap:
                from ..core.config import _round_up
                new_k = _round_up(rover + max(8, rover // 4), 8)
                print(f"WARNING: RDF-list neighbor count {rover} exceeded "
                      f"capacity {self.rcfg.k_cap}; rebuilding with "
                      f"k_cap={new_k}", file=sys.stderr)
                self.rcfg = dataclasses.replace(self.rcfg, k_cap=new_k)
                self._build_programs()
        # sparse engine: cell_overflow carries the REQUIRED tile-pair
        # worklist length; truncation past sparse_pair_cap means this
        # step's forces silently lost tile pairs — regrow and rebuild.
        # (f64 validation mode falls back to the block engine inside
        # pair_forces_sparse, so max_occ is CELL occupancy there — fall
        # through to the grid.cap comparison below instead)
        if self.cfg.pair_engine == "sparse" and self.cfg.dtype != "f64":
            need = int(self.state.cell_overflow)
            if need > self.cfg.sparse_pair_cap:
                from ..core.config import _round_up
                new_cap = _round_up(need + max(64, need // 4), 64)
                print(f"WARNING: sparse tile-pair count {need} exceeded "
                      f"capacity {self.cfg.sparse_pair_cap}; rebuilding "
                      f"with pair_cap={new_cap}", file=sys.stderr)
                self.cfg = dataclasses.replace(self.cfg,
                                               sparse_pair_cap=new_cap)
                self._build_programs()
            return
        # cell_overflow tracks the NB grid in neighbor mode, the main
        # grid otherwise — compare against the right capacity
        g = (self.cfg.nb_grid if self.cfg.pair_engine == "neighbor"
             else self.cfg.grid)
        occ = int(self.state.cell_overflow)
        if occ > g.cap:
            from ..core.config import CellGrid, _round_up
            new_cap = _round_up(occ + max(2, occ // 4), 4)
            print(f"WARNING: cell occupancy {occ} exceeded capacity "
                  f"{g.cap}; rebuilding with cap={new_cap}",
                  file=sys.stderr)
            new_grid = CellGrid(dims=g.dims, cap=new_cap,
                                stencil=g.stencil, edge=g.edge)
            if self.cfg.pair_engine == "neighbor":
                self.cfg = dataclasses.replace(self.cfg, nb_grid=new_grid)
            else:
                self.cfg = dataclasses.replace(self.cfg, grid=new_grid)
            self._build_programs()

    # ------------------------------------------------------------------
    def _write_rdf(self, path, final=False):
        if self.rcfg is None:
            return
        hist, nhist, count = self.hist, self.nhist, self.rdf_count
        if count == 0:
            if not (final and self._rdf_last is not None):
                return
            hist, nhist, count = self._rdf_last
        if self.profile:
            with self.timer.stage("rdf_out"):
                return self._write_rdf_impl(path, hist, nhist, count)
        return self._write_rdf_impl(path, hist, nhist, count)

    def _write_rdf_impl(self, path, hist, nhist, count):
        # rdf_sample accumulates 2*V/(Ni*Nj) per pair; normalize_rdf's
        # C1 = 1/(sphera dRDF^3 count), matching copy_rdf/copy_nrdf total
        hist = np.asarray(hist)
        gr = ops_rdf.normalize_rdf(self.rcfg, hist, count)
        W.write_rdf_file(path, self.rcfg, gr,
                         [s.name for s in self.fld.species])
        if self.rcfg.nuclei:
            nhist = np.asarray(nhist)
            ngr = ops_rdf.normalize_rdf(self.rcfg, nhist,
                                        count, nuclei=True)
            W.write_rdf_file(path.replace("rdf", "rdf_n", 1), self.rcfg,
                             ngr, list(self.fld.nnames))
        self._rdf_last = (hist, nhist, count)

    def finalize(self):
        """End-of-run outputs (main.cu:411-447)."""
        st = self._sview()
        fld, ctl, cfg = self.fld, self.ctl, self.cfg
        j = lambda p: os.path.join(self.out_dir, p)
        for w in (self.w_stat, self.w_bnd, self.w_msd, self.w_jmp,
                  self.w_traj, self.w_bindtraj, self.w_hist, self.w_vaf,
                  self.w_msdd):
            if w:
                w.close()
        self._write_rdf(j("rdf.dat"), final=True)

        pos = np.asarray(st.pos)
        vel = np.asarray(st.vel)
        types = np.asarray(st.types)
        names = [fld.species[t].name for t in types]
        W.write_atoms_xyz(j("revcon.xyz"), names, pos, cfg.box)
        if cfg.use_bnd:
            nb = int(st.n_bond)
            W.write_bondlist(j("revbonds.txt"), np.asarray(st.bond_at1)[:nb],
                             np.asarray(st.bond_at2)[:nb],
                             np.asarray(st.bond_type)[:nb])
            W.write_bond_lengths(j("lengths.dat"), fld,
                                 np.asarray(st.bond_at1)[:nb],
                                 np.asarray(st.bond_at2)[:nb],
                                 np.asarray(st.bond_type)[:nb],
                                 pos, cfg.box)
        if cfg.use_angl:
            na = int(st.n_angle)
            W.write_anglelist(j("revangles.txt"),
                              np.asarray(st.ang_central)[:na],
                              np.asarray(st.ang_lig1)[:na],
                              np.asarray(st.ang_lig2)[:na],
                              np.asarray(st.ang_type)[:na])
        W.write_velocities(j("velocities.dat"), fld, types, vel)
        if cfg.tstat_type == TSTAT_RADI:
            W.write_thermal_chars(j("tchars.dat"), fld, types,
                                  np.asarray(st.engs),
                                  np.asarray(st.radii))
        W.write_cn(j("CN.dat"), fld, ctl, types, pos, cfg.box)
        W.write_ncn(j("nCN.dat"), fld, ctl, types, pos, cfg.box)
        if not self.quiet:
            print(f"Finish. elapsed time: "
                  f"{time.time() - self._t0:.0f} s", flush=True)

    def _write_revcon(self, suffix=""):
        st = self._sview()
        types = np.asarray(st.types)
        names = [self.fld.species[t].name for t in types]
        W.write_atoms_xyz(os.path.join(self.out_dir, f"revcon{suffix}.xyz"),
                          names, np.asarray(st.pos), self.cfg.box)


def run_deck(deck_dir: str, out_dir: str = ".", n_steps: int | None = None,
             dtype: str = "f32", seed: int = 12345, quiet: bool = False,
             checkpoint_every: int = 0):
    """Load a reference deck directory and run it to completion."""
    from .setup import load_deck_dir
    sysd = load_deck_dir(deck_dir, dtype=dtype, seed=seed)
    runner = MDRunner(sysd, out_dir=out_dir, quiet=quiet,
                      checkpoint_every=checkpoint_every)
    runner.run(n_steps)
    runner.finalize()
    return runner
