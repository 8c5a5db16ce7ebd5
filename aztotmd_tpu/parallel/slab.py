"""Slab-decomposed FULL MD step with atom migration over a device mesh.

This is the scale-out execution mode the reference has no equivalent of
(it is single-GPU; SURVEY.md §2.3): the box is split into x-slabs, each
device OWNS the atoms inside its slab in a fixed-capacity slot array,
and one `shard_map`-ped step runs the whole schedule of
main.cu:281-410 locally:

  verlet-1 (drift + wrap)  →  migrate crossers to the slab neighbors
  (`lax.ppermute`, fixed-size buffers)  →  bin + halo-exchange boundary
  cell planes  →  stencil pair pass on the extended slab  →  verlet-2
  →  thermostat  →  global scalars via `psum`.

Unlike `parallel/mesh.py` (atom-sharded, cell table replicated via
all-gather) nothing global is materialised per step: each device touches
only its ~N/D atoms plus two boundary planes, so both compute and
memory scale with the mesh.  The radiative thermostat stays trajectory-
identical to the single-device engine because its noise is keyed by
(seed, step, global atom id) (ops/prng.py), not by array position.

Scope: pair potentials incl. Surkov radii, direct/Fennel/full-Ewald
electrostatics (the recip sum is a per-slab partial S(k) + one psum),
all thermostats, CONSTANT bonds/angles (per-atom topology records
that migrate with their atoms; see _bonded_pass), and REACTIVE
topology (variable bonds/angles, e-jumps) via the replicated-tables /
sharded-geometry design of parallel/slab_react.py.

Empty-slot invariant: gid == -1 marks a free slot; its pos/vel/frc/
engs are all-zero and every stage preserves that.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.config import _round_up
from ..core.state import Energies
from ..io.control import ELEC_EWALD, ELEC_NONE, TSTAT_NOSE, TSTAT_RADI
from ..ops import integrate as integ
from ..ops import thermostat as tstat
from ..ops.pairs import MX_FRC
from ..ops.vdw import vdw_eval
from ..ops.elec import coul_eval

AXIS = "x"


@jax.tree_util.register_dataclass
@dataclass
class SlabState:
    """Per-device slot arrays + replicated scalars (leading dim of the
    per-slot arrays is D*C globally, sharded over the mesh axis)."""
    gid: jax.Array        # (C,) int32 global atom id, -1 = empty slot
    types: jax.Array      # (C,) int32
    pos: jax.Array        # (C, 3)
    vel: jax.Array        # (C, 3)
    frc: jax.Array        # (C, 3)
    engs: jax.Array       # (C,) thermal internal energy
    radii: jax.Array      # (C,) thermal radius
    # --- per-atom topology (travels with the atom on migration) ---
    # constant-bond decks: each atom carries its bond records by
    # GLOBAL partner id; each side of a bond holds a record, computes
    # the force on ITSELF and half the energy (cuBonds.cu:709-796
    # semantics without the shared bond table)
    bnd_partner: jax.Array  # (C, B) int32 partner gid, -1 = empty
    bnd_type: jax.Array     # (C, B) int32 bond type, 0 = empty
    # angles: every participant holds the record (role inferred by
    # matching its gid); only its own force share is applied and only
    # the central atom's owner counts the energy
    ang_c: jax.Array        # (C, A) int32 central gid, -1 = empty
    ang_l1: jax.Array       # (C, A) int32
    ang_l2: jax.Array       # (C, A) int32
    ang_t: jax.Array        # (C, A) int32 angle type, 0 = empty

    # --- replicated scalars ---
    rng: jax.Array        # (2,) uint32
    step: jax.Array       # () int32
    energies: Energies
    pressure: jax.Array
    chit: jax.Array
    consint: jax.Array
    pos_mom: jax.Array    # (3,)
    neg_mom: jax.Array
    mom_buf_pos: jax.Array
    mom_buf_neg: jax.Array
    i_mom: jax.Array
    cross_pos: jax.Array  # (nsp, 3) int32
    cross_neg: jax.Array
    mig_total: jax.Array  # () int32 — atoms migrated so far (diagnostic)
    mig_lost: jax.Array   # () int32 — atoms DELETED (receiver slots full)
    mig_defer: jax.Array  # () int32 — sends deferred to a later step
    #                       (sender buffer full / >1-slab movers; the
    #                       atom stays put and retries next step)
    slab_occ: jax.Array   # () int32 — max per-cell occupancy seen (vs
    #                       grid.cap; the slab analog of cell_overflow)
    bond_miss: jax.Array  # () int32 — bond/angle records whose partner
    #                       was outside the +-1-slab position table
    #                       (stretched topology; forces silently
    #                       dropped — surfaced by the runner)
    # --- reactive decks only: replicated topology tables (None for
    #     constant-topology decks; see parallel/slab_react.py) ---
    rg: object = None

    def replace(self, **kw) -> "SlabState":
        return dataclasses.replace(self, **kw)


PER_SLOT = ("gid", "types", "pos", "vel", "frc", "engs", "radii",
            "bnd_partner", "bnd_type", "ang_c", "ang_l1", "ang_l2",
            "ang_t")
# per-atom payload that travels with a migrating atom
_MIG_F = ("pos", "vel", "frc")          # (C,3) float fields
_MIG_F1 = ("engs", "radii")             # (C,) float fields
_MIG_I = ("gid", "types")               # (C,) int fields
_MIG_I2 = ("bnd_partner", "bnd_type", "ang_c", "ang_l1", "ang_l2",
           "ang_t")                     # (C, k) int topology fields
# empty-slot marker per topology field (partners/gids -1, types 0)
_TOPO_FILL = {"bnd_partner": -1, "bnd_type": 0, "ang_c": -1,
              "ang_l1": -1, "ang_l2": -1, "ang_t": 0}


def slab_caps(cfg, n_dev: int, cap_factor: float = 1.6):
    """(slot capacity C per device, migration buffer M per direction)."""
    C = _round_up(int(cfg.n_at / n_dev * cap_factor) + 8, 8)
    M = _round_up(max(8, C // 8), 8)
    return C, M


def max_devices(cfg) -> int:
    """Hard ceiling on `run --mesh N` slab devices for this deck: each
    slab must be at least one cutoff-wide cell thick, so
    N <= floor(box_x / r_max).

    This 1D-decomposition ceiling is a BOX-SIZE limit, not an atom
    limit: any deck big enough to need multi-chip has a large box
    (bundled decks: cs1 1141.5 A / 4 A -> 285 devices; the 320k-atom
    scale deck 2283 A -> 570; the 1M deck 3425 A -> 856).  Only
    small-box decks are capped low (cs2: 35 A / 6 A cells -> 5
    devices for 4000 atoms, ~800 atoms/device — already past the
    useful scaling point).  A 2D pencil decomposition would lift the
    small-box cap but targets exactly the decks where scale-out has
    nothing left to win; recorded as a design ceiling instead
    (VERDICT r4 item 6, BASELINE.md mesh notes)."""
    return max(1, int(cfg.box[0] / cfg.r_max))


def check_slab_cfg(cfg, n_dev: int):
    grid = cfg.grid
    if n_dev < 2:
        raise ValueError("slab mode needs >= 2 devices (single-device "
                         "runs use the regular engines)")
    if grid.dims[0] % n_dev:
        raise ValueError(f"ncx={grid.dims[0]} not divisible by {n_dev}")
    if min(grid.dims) < 3 or any(abs(o) > 1 for off in grid.stencil
                                 for o in off):
        raise ValueError("slab decomposition needs a 27-point stencil "
                         "(cell edge >= cutoff, >= 3 cells per axis)")
    # bond-free ejump decks: the serial-twin environment-dU sweep is
    # SHARDED over the mesh (each device contributes its owned slots
    # as neighbor columns, psum restores the sums — see
    # slab_react.reactive_pass), so no atom-count cap applies.


def prepare_slab_cfg(cfg, n_dev: int):
    """Return a cfg whose grid satisfies the slab constraints: 27-point
    block stencil (cell edge >= cutoff), ncx divisible by n_dev.  The
    runner calls this when `run --mesh N` is requested, whatever engine
    the deck auto-selected."""
    import dataclasses
    from ..ops.cellblock import make_block_grid

    grid = cfg.grid
    ok = (grid is not None and min(grid.dims) >= 3
          and not any(abs(o) > 1 for off in grid.stencil for o in off))
    if not ok:
        grid = make_block_grid(cfg.box, cfg.r_max, cfg.n_at)
    ncx = grid.dims[0]
    if ncx % n_dev:
        ncx = max((ncx // n_dev) * n_dev, n_dev)
        if cfg.box[0] / ncx < cfg.r_max:
            raise ValueError(
                f"box x ({cfg.box[0]} A) cannot host {n_dev} slabs of "
                f"cell edge >= {cfg.r_max} A; this deck's 1D-slab "
                f"ceiling is --mesh {max_devices(cfg)} "
                "(see parallel.slab.max_devices)")
        grid = dataclasses.replace(
            grid, dims=(ncx,) + grid.dims[1:],
            edge=(cfg.box[0] / ncx,) + grid.edge[1:])
    from .slab_react import reactive_mode
    engine = "block"
    if (cfg.pair_engine in ("pallas", "sparse") and not reactive_mode(cfg)
            and cfg.dtype != "f64"):
        # f64 validation decks stay on the block path (the Mosaic
        # kernels compute f32 — _pair_pass makes the same check, and
        # the routing message below must match what actually runs)
        # dense/clustered decks keep a dense pair pass on the mesh:
        # `_pair_pass_dense` runs the tiled rectangular Pallas kernel
        # over [own; adjacent-slab halos] at O(3 * C^2) slot pairs per
        # device — the same trade the single-chip dense kernel wins on
        # these decks — instead of the block pass's ~27 * cap^2 per
        # cell (the round-3 cost-model guard warned here; round 4
        # routes instead).  Morton-sparse decks ride the same path:
        # per-device C = N/D * cap_factor keeps the dense cost bounded,
        # and the worklist machinery doesn't compose with slab halos.
        # REACTIVE clustered decks stay on the block pass: the mesh
        # reactive tests pin near-exact trajectories vs single-chip,
        # and the dense kernel's different f32 sum order amplifies
        # chaotically past those bounds by a few hundred steps.
        import sys
        engine = "pallas"
        n_halo = 2 if n_dev == 2 else 3
        print(f"slab mesh: '{cfg.pair_engine}' deck routed to the "
              f"dense rectangular pair pass "
              f"(>={n_halo * slab_caps(cfg, n_dev)[0] ** 2} slot pairs/"
              f"device/step — lower bound: make_slab_state grows the "
              f"slot cap C to the observed worst-slab occupancy, up to "
              f"C~N on heavily clustered decks — vs ~27*cap^2 = "
              f"{27 * grid.cap ** 2} per cell on the block path)",
              file=sys.stderr)
    cfg = dataclasses.replace(cfg, grid=grid, pair_engine=engine)
    check_slab_cfg(cfg, n_dev)
    return cfg


def state_specs(mesh: Mesh, reactive: bool = False):
    """PartitionSpec pytree for SlabState: slot arrays split over the
    slab axis, scalars (incl. the reactive topology tables) replicated."""
    def spec(field):
        if field.name in PER_SLOT:
            return P(AXIS)
        return P()
    specs = {f.name: spec(f) for f in dataclasses.fields(SlabState)}
    specs["energies"] = Energies(*[P()] * len(
        dataclasses.fields(Energies)))
    from .slab_react import globals_spec
    specs["rg"] = globals_spec() if reactive else None
    return SlabState(**specs)


def make_slab_state(cfg, state, mesh: Mesh, cap_factor: float = 1.6):
    """Distribute a single-device MDState onto the mesh by x-slab.

    Returns the sharded SlabState.  Host-side: O(N) numpy.
    """
    n_dev = mesh.devices.size
    check_slab_cfg(cfg, n_dev)
    C, _ = slab_caps(cfg, n_dev, cap_factor)
    N = cfg.n_at
    ncx = cfg.grid.dims[0]
    nloc = ncx // n_dev

    pos = np.asarray(state.pos)
    dt = pos.dtype
    # same cell-x expression as _pair_pass/_migrate (see _migrate)
    scale_x = dt.type(ncx / cfg.box[0])
    cx = np.floor(pos[:, 0] * scale_x).astype(np.int64) % ncx
    dev_of = cx // nloc
    # clustered decks can pile most of the deck into one slab (cs2's
    # 21 A cluster: ~89% of the atoms in one half of the box) — grow
    # the slot capacity to the observed worst slab plus headroom for
    # early migration drift instead of failing
    occ0 = int(np.bincount(dev_of, minlength=n_dev).max())
    C = max(C, _round_up(occ0 + occ0 // 8 + 8, 8))

    def alloc(shape, dtype, fill=0):
        return np.full((n_dev * C,) + shape, fill, dtype)

    # reactive decks: topology stays in the replicated global tables
    # (slab_react.ReactiveGlobals); the per-atom records are 1-wide
    # dummies so the migration payload stays small
    from .slab_react import make_globals, reactive_mode
    reactive = reactive_mode(cfg)

    # per-atom topology from the global tables (constant decks): each
    # side of a bond gets a record; each angle participant gets the
    # full (c, l1, l2, type) record
    b_at1 = np.asarray(state.bond_at1)
    b_at2 = np.asarray(state.bond_at2)
    b_t = np.asarray(state.bond_type)
    live_b = (b_t != 0) & (not reactive)
    deg = np.zeros(N, np.int64)
    for a in (b_at1[live_b], b_at2[live_b]):
        np.add.at(deg, a, 1)
    B = max(1, int(deg.max()) if live_b.any() else 1)
    bp = np.full((N, B), -1, np.int32)
    btp = np.zeros((N, B), np.int32)
    fill_n = np.zeros(N, np.int64)
    for me, other in ((b_at1, b_at2), (b_at2, b_at1)):
        for k in np.flatnonzero(live_b):
            i = me[k]
            bp[i, fill_n[i]] = other[k]
            btp[i, fill_n[i]] = b_t[k]
            fill_n[i] += 1

    a_c = np.asarray(state.ang_central)
    a_1 = np.asarray(state.ang_lig1)
    a_2 = np.asarray(state.ang_lig2)
    a_t = np.asarray(state.ang_type)
    live_a = (a_t != 0) & (not reactive)
    dega = np.zeros(N, np.int64)
    for a in (a_c[live_a], a_1[live_a], a_2[live_a]):
        np.add.at(dega, a, 1)
    A = max(1, int(dega.max()) if live_a.any() else 1)
    ang = {k: np.full((N, A), f, np.int32)
           for k, f in (("ang_c", -1), ("ang_l1", -1),
                        ("ang_l2", -1), ("ang_t", 0))}
    fill_n[:] = 0
    for role in (a_c, a_1, a_2):
        for k in np.flatnonzero(live_a):
            i = role[k]
            j = fill_n[i]
            ang["ang_c"][i, j] = a_c[k]
            ang["ang_l1"][i, j] = a_1[k]
            ang["ang_l2"][i, j] = a_2[k]
            ang["ang_t"][i, j] = a_t[k]
            fill_n[i] += 1

    out = {
        "gid": alloc((), np.int32, -1),
        "types": alloc((), np.int32),
        "pos": alloc((3,), dt), "vel": alloc((3,), dt),
        "frc": alloc((3,), dt),
        "engs": alloc((), dt), "radii": alloc((), dt),
        "bnd_partner": alloc((B,), np.int32, -1),
        "bnd_type": alloc((B,), np.int32),
        "ang_c": alloc((A,), np.int32, -1),
        "ang_l1": alloc((A,), np.int32, -1),
        "ang_l2": alloc((A,), np.int32, -1),
        "ang_t": alloc((A,), np.int32),
    }
    src = {"pos": pos, "vel": np.asarray(state.vel),
           "frc": np.asarray(state.frc),
           "engs": np.asarray(state.engs),
           "radii": np.asarray(state.radii),
           "types": np.asarray(state.types),
           "gid": np.arange(N, dtype=np.int32),
           "bnd_partner": bp, "bnd_type": btp, **ang}
    for d in range(n_dev):
        idx = np.flatnonzero(dev_of == d)
        if len(idx) > C:
            raise ValueError(f"slab {d} holds {len(idx)} atoms > "
                             f"capacity {C}; raise cap_factor")
        for k, v in out.items():
            v[d * C: d * C + len(idx)] = src[k][idx]

    repl = NamedSharding(mesh, P())
    sstate = SlabState(
        rng=np.asarray(state.rng), step=np.asarray(state.step),
        energies=jax.tree_util.tree_map(np.asarray, state.energies),
        pressure=np.asarray(state.pressure),
        chit=np.asarray(state.chit), consint=np.asarray(state.consint),
        pos_mom=np.asarray(state.pos_mom),
        neg_mom=np.asarray(state.neg_mom),
        mom_buf_pos=np.asarray(state.mom_buf_pos),
        mom_buf_neg=np.asarray(state.mom_buf_neg),
        i_mom=np.asarray(state.i_mom),
        cross_pos=np.asarray(state.cross_pos),
        cross_neg=np.asarray(state.cross_neg),
        mig_total=np.zeros((), np.int32),
        mig_lost=np.zeros((), np.int32),
        mig_defer=np.zeros((), np.int32),
        slab_occ=np.zeros((), np.int32),
        bond_miss=np.zeros((), np.int32),
        rg=make_globals(state) if reactive else None,
        **out)

    def put(path, leaf):
        name = path[0].name if path else ""
        if name in PER_SLOT:
            sh = NamedSharding(mesh, P(AXIS, *([None] * (leaf.ndim - 1))))
        else:
            sh = repl
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(put, sstate)


GATHER_FIELDS = ("pos", "vel", "frc", "engs", "radii", "types")


def gather_state(sstate: SlabState, n_at: int, fields=GATHER_FIELDS):
    """Host-side: reassemble per-atom arrays in global-id order.
    Returns dict of numpy arrays for the requested fields (each d2h
    pull over the tunnel costs real time — stat sampling asks for
    ("pos",) only)."""
    gid = np.asarray(sstate.gid)
    live = gid >= 0
    order = gid[live]
    out = {}
    for name in fields:
        a = np.asarray(getattr(sstate, name))[live]
        full = np.zeros((n_at,) + a.shape[1:], a.dtype)
        full[order] = a
        out[name] = full
    return out


# ----------------------------------------------------------------------
def _migrate(cfg, n_dev, nloc, M, st_dict, valid):
    """Send atoms that crossed a slab boundary to the neighbor device.

    One hop per step (an atom cannot cross a whole slab in one dt at
    sane timesteps; farther movers stay put and are counted in
    mig_defer).  Returns (new st_dict, valid, n_migrated, n_lost,
    n_defer) — n_lost counts DELETED atoms (receiver slots full);
    n_defer counts atoms kept in place for a later retry.
    """
    pos = st_dict["pos"]
    dt = pos.dtype
    C = pos.shape[0]
    dev = jax.lax.axis_index(AXIS)
    ncx = nloc * n_dev
    # EXACTLY the cell-x expression of _pair_pass (floor(pos*scale) mod
    # ncx) — any FP divergence between the two puts a boundary atom on a
    # device whose pair pass treats it as out-of-slab (zero forces)
    scale_x = jnp.asarray(ncx / cfg.box[0], dt)
    cx = jnp.floor(pos[:, 0] * scale_x).astype(jnp.int32) % ncx
    slab = cx // nloc
    delta = (slab - dev) % n_dev                 # 0 stay, 1 right, D-1 left
    go_r = valid & (delta == 1)
    if n_dev == 2:
        # both neighbors are the SAME device: delta==1 covers both
        # directions and the right exchange alone delivers correctly;
        # a second (left) exchange would duplicate every crosser
        go_l = jnp.zeros_like(go_r)
    else:
        go_l = valid & (delta == n_dev - 1)
    stray = valid & (delta != 0) & ~go_r & ~go_l
    n_stray = jnp.sum(stray.astype(jnp.int32))

    def pack(go):
        """Compact sender rows into fixed (M, ...) buffers."""
        n_go = jnp.sum(go.astype(jnp.int32))
        order = jnp.argsort(~go)                 # senders first (stable)
        rows = order[:M]
        sent_ok = jnp.arange(M) < jnp.minimum(n_go, M)
        buf = {}
        for k in _MIG_I:
            fill = jnp.asarray(-1 if k == "gid" else 0, jnp.int32)
            buf[k] = jnp.where(sent_ok, st_dict[k][rows], fill)
        for k in _MIG_F1:
            buf[k] = jnp.where(sent_ok, st_dict[k][rows], 0)
        for k in _MIG_F:
            buf[k] = jnp.where(sent_ok[:, None], st_dict[k][rows], 0)
        for k in _MIG_I2:
            buf[k] = jnp.where(sent_ok[:, None], st_dict[k][rows],
                               _TOPO_FILL[k])
        # senders beyond the buffer stay put this step (counted lost)
        overflow = jnp.maximum(n_go - M, 0)
        cleared = go & (jnp.zeros((C,), bool).at[rows].set(
            sent_ok, mode="drop"))
        return buf, cleared, overflow

    buf_r, clr_r, ov_r = pack(go_r)
    buf_l, clr_l, ov_l = pack(go_l)

    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    recv_r = jax.tree_util.tree_map(
        lambda b: jax.lax.ppermute(b, AXIS, right), buf_r)
    recv_l = jax.tree_util.tree_map(
        lambda b: jax.lax.ppermute(b, AXIS, left), buf_l)
    recv = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), recv_r, recv_l)

    # clear sent slots
    cleared = clr_r | clr_l
    valid = valid & ~cleared
    for k in _MIG_I:
        fill = jnp.asarray(-1 if k == "gid" else 0, jnp.int32)
        st_dict[k] = jnp.where(cleared, fill, st_dict[k])
    for k in _MIG_F1:
        st_dict[k] = jnp.where(cleared, 0, st_dict[k])
    for k in _MIG_F:
        st_dict[k] = jnp.where(cleared[:, None], 0, st_dict[k])
    for k in _MIG_I2:
        st_dict[k] = jnp.where(cleared[:, None], _TOPO_FILL[k],
                               st_dict[k])

    # insert received atoms into free slots
    rvalid = recv["gid"] >= 0
    rorder = jnp.argsort(~rvalid)               # valid receives first
    rvalid_s = rvalid[rorder]
    n_recv = jnp.sum(rvalid.astype(jnp.int32))
    free_first = jnp.argsort(valid)             # free slots first
    n_free = jnp.sum((~valid).astype(jnp.int32))
    fit = rvalid_s & (jnp.arange(2 * M) < n_free)
    dest = free_first[: 2 * M]
    for k in _MIG_I + _MIG_F1 + _MIG_F + _MIG_I2:
        r = recv[k][rorder]
        old = st_dict[k][dest]
        m = fit if r.ndim == 1 else fit[:, None]
        st_dict[k] = st_dict[k].at[dest].set(jnp.where(m, r, old),
                                             mode="drop")
    valid = st_dict["gid"] >= 0
    # true deletions (sender already cleared, receiver had no slot) vs
    # deferred sends (atom stayed put, retried next step)
    n_lost = jnp.maximum(n_recv - n_free, 0)
    n_defer = ov_r + ov_l + n_stray
    return st_dict, valid, n_recv, n_lost, n_defer


# ----------------------------------------------------------------------
def _bonded_pass(cfg, ff, n_dev, st_dict, valid):
    """Constant bond + angle forces from the per-atom topology records.

    Builds a gid-keyed position table from the local slab plus both
    neighbor slabs (two ppermutes of the full (C, 3)+gid payload —
    bond reach <= cell edge <= slab width, so every partner of a local
    atom lives within one slab) and evaluates each record on its
    holder: a bond record applies the self-side force and half the
    energy (both partners hold it); an angle record applies the
    holder's role share, energy counted by the central atom's owner
    (cuBonds.cu:709-796 / cuAngles.cu:230-284 semantics without the
    shared tables).  Returns (frc_add, e_bond, e_angle, n_miss) —
    n_miss counts records whose partner was NOT in the +-1-slab table
    (topology stretched beyond a slab: physically broken, surfaced by
    the runner's slab health check).
    """
    from ..ops.bonds import bond_eval
    from ..ops.pairs import min_image

    N = cfg.n_at
    pos = st_dict["pos"]
    gid = st_dict["gid"]
    dt = pos.dtype

    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = (jax.lax.ppermute(pos, AXIS, right),
                 jax.lax.ppermute(gid, AXIS, right))
    from_right = (jax.lax.ppermute(pos, AXIS, left),
                  jax.lax.ppermute(gid, AXIS, left))
    pos_tab = jnp.zeros((N + 1, 3), dt)
    present = jnp.zeros((N + 1,), bool)
    for p, g in ((pos, gid), from_left, from_right):
        idx = jnp.where(g >= 0, g, N)
        pos_tab = pos_tab.at[idx].set(p, mode="drop")
        present = present.at[idx].set(g >= 0, mode="drop")
    present = present.at[N].set(False)

    frc = jnp.zeros_like(pos)
    e_bond = jnp.zeros((), dt)
    e_angle = jnp.zeros((), dt)
    n_miss = jnp.zeros((), jnp.int32)

    if cfg.use_bnd:
        bp = st_dict["bnd_partner"]                    # (C, B)
        bt = st_dict["bnd_type"]
        live = (bt != 0) & (bp >= 0) & valid[:, None]
        pidx = jnp.where(live, bp, N)
        there = live & present[pidx]
        ppos = pos_tab[pidx]                           # (C, B, 3)
        delta = min_image(pos[:, None, :] - ppos, cfg)
        r2 = jnp.where(there, jnp.sum(delta * delta, -1), 1.0)
        r = jnp.sqrt(r2)
        kind = jnp.where(there, ff.bond_kind[bt], 0)
        f, e = bond_eval(kind, ff.bond_p[bt], r2, r,
                         kinds=cfg.bond_kinds)
        f = jnp.where(there, f, 0.0)
        frc = frc + jnp.sum(f[..., None] * delta, axis=1)
        e_bond = 0.5 * jnp.sum(jnp.where(there, e, 0.0))
        n_miss = n_miss + jnp.sum((live & ~present[pidx])
                                  .astype(jnp.int32))

    if cfg.use_angl:
        ac = st_dict["ang_c"]                          # (C, A)
        al1 = st_dict["ang_l1"]
        al2 = st_dict["ang_l2"]
        at_ = st_dict["ang_t"]
        live = (at_ != 0) & valid[:, None]

        def getp(g):
            idx = jnp.where(live & (g >= 0), g, N)
            return pos_tab[idx], present[idx]

        pc, okc = getp(ac)
        p1, ok1 = getp(al1)
        p2, ok2 = getp(al2)
        ok = live & okc & ok1 & ok2
        dij = min_image(p1 - pc, cfg)
        dik = min_image(p2 - pc, cfg)
        r2ij = jnp.where(ok, jnp.sum(dij * dij, -1), 1.0)
        r2ik = jnp.where(ok, jnp.sum(dik * dik, -1), 1.0)
        rij = jnp.sqrt(r2ij)
        rik = jnp.sqrt(r2ik)
        k = ff.ang_p[at_, 0]
        cos0 = ff.ang_p[at_, 1]
        cos_th = jnp.sum(dij * dik, -1) / (rij * rik)
        dcos = cos_th - cos0
        c1 = -k * dcos
        c2 = 1.0 / (rij * rik)
        f1 = c1[..., None] * (dik * c2[..., None]
                              - cos_th[..., None] * dij / r2ij[..., None])
        f2 = c1[..., None] * (dij * c2[..., None]
                              - cos_th[..., None] * dik / r2ik[..., None])
        fc = -(f1 + f2)
        mine = jnp.where((gid[:, None] == ac)[..., None], fc,
                         jnp.where((gid[:, None] == al1)[..., None],
                                   f1, f2))
        frc = frc + jnp.sum(jnp.where(ok[..., None], mine, 0.0), axis=1)
        e_angle = jnp.sum(jnp.where(ok & (gid[:, None] == ac),
                                    0.5 * k * dcos * dcos, 0.0))
        n_miss = n_miss + jnp.sum((live & ~(okc & ok1 & ok2))
                                  .astype(jnp.int32))

    return frc, e_bond, e_angle, n_miss


# ----------------------------------------------------------------------
def _pair_pass_dense(cfg, ff, n_dev, st_dict, valid):
    """Dense rectangular pair pass for clustered/dense decks on the
    slab mesh (pair_engine 'pallas'/'sparse' routed here by
    prepare_slab_cfg): forces on owned slots from [own; left-slab;
    right-slab] full-slab halos via the dense tiled Pallas kernel
    (ops.pallas_pair.pair_forces_allpairs_rect).  Cell edge >= cutoff
    (check_slab_cfg) makes the two adjacent slabs a superset of every
    in-range partner; the kernel's full-box min-image handles the
    periodic wrap, so halo coordinates need no shifting.  n_dev == 2:
    left == right neighbour — exchange one halo copy only (the block
    pass's degenerate-ring rule, otherwise every cross-slab pair is
    double-counted).  Per-device cost is O(C * 3C) slot pairs vs the
    block pass's 27 * cap^2 * n_cell — the same trade the single-chip
    dense kernel wins on clustered decks (cuPairs.cu:220-270 regime).
    Returns (frc (C,3), e_vdw, e_coul, occ=0) — same contract as
    `_pair_pass` (energies need the caller's psum)."""
    from ..ops.pallas_pair import pair_forces_allpairs_rect
    pos, types = st_dict["pos"], st_dict["types"]
    use_radii = bool(cfg.use_radii)
    # invalid slots carry radii = 0: Surkov's 1/(p2*ra + p3*rb) is inf
    # there, and 0 * inf = NaN survives the masked energy sum (the
    # round-3 padding lesson) — sanitize to 1.0 before the halo
    radii = jnp.where(valid, st_dict["radii"], 1.0) if use_radii \
        else None
    # perms named by what ARRIVES (the halo() convention below):
    # (i, i+1) sends i's slab rightward, so each device receives its
    # LEFT neighbour's slab
    from_left = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    from_right = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    own = (pos, types, valid, radii)
    parts = [own]
    for prm in ([from_left] if n_dev == 2 else [from_left, from_right]):
        parts.append(tuple(
            None if a is None else jax.lax.ppermute(a, AXIS, prm)
            for a in own))
    pos_j = jnp.concatenate([p[0] for p in parts])
    types_j = jnp.concatenate([p[1] for p in parts])
    valid_j = jnp.concatenate([p[2] for p in parts])
    radii_j = jnp.concatenate([p[3] for p in parts]) if use_radii \
        else None
    frc, e_vdw, e_coul = pair_forces_allpairs_rect(
        cfg, ff, pos, types, valid, pos_j, types_j, valid_j,
        radii_i=radii, radii_j=radii_j)
    frc = jnp.where(valid[:, None], frc, 0.0)
    return frc, e_vdw, e_coul, jnp.zeros((), jnp.int32)


def _pair_pass(cfg, ff, n_dev, st_dict, valid):
    """Bin local atoms, halo-exchange boundary planes, run the stencil
    pair pass.  Dense/clustered decks (pair_engine 'pallas', routed by
    prepare_slab_cfg) go to `_pair_pass_dense`; the cell-block stencil
    path below handles the rest.  Returns (frc (C,3), e_vdw, e_coul,
    occ) — per-device
    locals; energies need a psum by the caller; occ is the max per-cell
    occupancy (rank >= cap atoms get NO pair force — the caller must
    monitor occ against grid.cap like the single-device cell_overflow
    path, runner._check_overflow)."""
    if cfg.pair_engine == "pallas" and cfg.dtype != "f64":
        # f64 validation mode stays on the XLA block path below (the
        # Mosaic kernels compute f32 — see pair_forces_pallas)
        return _pair_pass_dense(cfg, ff, n_dev, st_dict, valid)
    grid = cfg.grid
    ncx, ncy, ncz = grid.dims
    cap = grid.cap
    nloc = ncx // n_dev
    pos = st_dict["pos"]
    types = st_dict["types"]
    C = pos.shape[0]
    dt = pos.dtype
    nsp = cfg.n_spec
    dev = jax.lax.axis_index(AXIS)
    x0 = dev * nloc

    scale = jnp.asarray([grid.dims[k] / cfg.box[k] for k in range(3)], dt)
    c = jnp.floor(pos * scale).astype(jnp.int32) \
        % jnp.asarray(grid.dims, jnp.int32)
    in_slab = valid & (c[:, 0] >= x0) & (c[:, 0] < x0 + nloc)
    n_cell_loc = nloc * ncy * ncz
    cid = ((c[:, 0] - x0) * ncy + c[:, 1]) * ncz + c[:, 2]
    cid = jnp.where(in_slab, cid, n_cell_loc)
    order = jnp.argsort(cid)
    scid = cid[order]
    first = jnp.searchsorted(scid, scid, side="left")
    rank = jnp.arange(C, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = jnp.where((rank < cap) & (scid < n_cell_loc),
                     rank * n_cell_loc + scid, cap * n_cell_loc)
    occ = jnp.max(jnp.where(scid < n_cell_loc, rank + 1, 0)) \
        .astype(jnp.int32)

    def blk(vals, fill=0.0):
        out = jnp.full((cap * n_cell_loc,), fill, vals.dtype)
        return out.at[slot].set(vals[order], mode="drop") \
            .reshape(cap, nloc, ncy, ncz)

    use_radii = bool(cfg.use_radii)
    bx = blk(pos[:, 0])
    by = blk(pos[:, 1])
    bz = blk(pos[:, 2])
    bv = blk(jnp.where(valid, 1.0, 0.0).astype(dt))
    bt = blk(types.astype(dt)).astype(jnp.int32)
    br = blk(st_dict["radii"]) if use_radii else None

    # --- halo exchange of boundary x-planes over ICI ---
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    box_x = jnp.asarray(cfg.box[0], dt)

    def halo(b, is_x=False):
        from_left = jax.lax.ppermute(b[:, -1:], AXIS, right)
        from_right = jax.lax.ppermute(b[:, :1], AXIS, left)
        if is_x:
            from_left = jnp.where(dev == 0, from_left - box_x, from_left)
            from_right = jnp.where(dev == n_dev - 1,
                                   from_right + box_x, from_right)
        return jnp.concatenate([from_left, b, from_right], axis=1)

    ex = halo(bx, True)
    ey = halo(by)
    ez = halo(bz)
    ev_ = halo(bv)
    et = halo(bt)
    er = halo(br) if use_radii else None

    xi = bx.reshape(cap, -1)
    yi = by.reshape(cap, -1)
    zi = bz.reshape(cap, -1)
    vi = bv.reshape(cap, -1)
    ti = bt.reshape(cap, -1)
    ri = br.reshape(cap, -1) if use_radii else None

    fx = jnp.zeros_like(xi)
    fy = jnp.zeros_like(xi)
    fz = jnp.zeros_like(xi)
    e_vdw = jnp.zeros((), dt)
    e_coul = jnp.zeros((), dt)
    box = jnp.asarray(cfg.box, dt)

    for off in grid.stencil:
        dx_, dy_, dz_ = off

        def nb(e):
            a = e[:, 1 + dx_: 1 + dx_ + nloc]
            if dy_:
                a = jnp.roll(a, -dy_, axis=2)
            if dz_:
                a = jnp.roll(a, -dz_, axis=3)
            return a.reshape(cap, -1)

        xj, yj, zj = nb(ex), nb(ey), nb(ez)
        vj, tj = nb(ev_), nb(et)

        ddx = xi[:, None, :] - xj[None, :, :]
        ddy = yi[:, None, :] - yj[None, :, :]
        ddz = zi[:, None, :] - zj[None, :, :]
        ddy = ddy - box[1] * jnp.round(ddy / box[1])
        ddz = ddz - box[2] * jnp.round(ddz / box[2])
        r2 = ddx * ddx + ddy * ddy + ddz * ddz

        mask = (vi[:, None, :] * vj[None, :, :]) > 0.0
        mask = mask & (r2 <= cfg.r2_max)
        if off == (0, 0, 0):
            eye = jnp.eye(cap, dtype=bool)
            mask = mask & ~eye[:, :, None]

        r2s = jnp.where(mask, r2, 1.0)
        rr = jnp.sqrt(r2s)
        tpair = ti[:, None, :] * nsp + tj[None, :, :]

        if cfg.elec_type != ELEC_NONE:
            chp = ff.chprod.reshape(-1)[tpair]
            fc, ecl = coul_eval(cfg, r2s, rr, chp)
            fc = jnp.where(mask, fc, 0.0)
            ecl = jnp.where(mask, ecl, 0.0)
        else:
            fc = ecl = jnp.zeros_like(r2s)

        if cfg.vdw_families:
            kind = ff.vdw_kind.reshape(-1)[tpair]
            vp = ff.vdw_p.reshape(-1, 5)[tpair]
            r2cut = ff.vdw_r2cut.reshape(-1)[tpair]
            vmask = mask & (r2 <= r2cut)
            kind = jnp.where(vmask, kind, 0)
            if use_radii:
                rj = nb(er)
                ra = jnp.broadcast_to(ri[:, None, :], r2s.shape)
                rb = jnp.broadcast_to(rj[None, :, :], r2s.shape)
                fv, evd = vdw_eval(kind, vp, r2s, rr, rad_i=ra, rad_j=rb,
                                   families=cfg.vdw_families)
            else:
                fv, evd = vdw_eval(kind, vp, r2s, rr,
                                   families=cfg.vdw_families)
            fv = jnp.where(vmask, fv, 0.0)
            evd = jnp.where(vmask, evd, 0.0)
        else:
            fv = evd = jnp.zeros_like(r2s)

        f = jnp.clip(fc + fv, -MX_FRC, MX_FRC)
        fx = fx + jnp.sum(f * ddx, axis=1)
        fy = fy + jnp.sum(f * ddy, axis=1)
        fz = fz + jnp.sum(f * ddz, axis=1)
        e_vdw = e_vdw + 0.5 * jnp.sum(evd)
        e_coul = e_coul + 0.5 * jnp.sum(ecl)

    # back to slot order (each device owns its atoms — no psum)
    soa = jnp.full((C,), cap * n_cell_loc, jnp.int32)
    soa = soa.at[order].set(slot)

    def unsort(a):
        flat = jnp.concatenate([a.reshape(-1), jnp.zeros((1,), a.dtype)])
        return flat[jnp.minimum(soa, cap * n_cell_loc)]

    frc = jnp.stack([unsort(fx), unsort(fy), unsort(fz)], axis=1)
    return frc, e_vdw, e_coul, occ


# ----------------------------------------------------------------------
class _AtomView:
    """Duck-typed mini-state over slot arrays so the single-device
    integrator/thermostat kernels run unchanged per device."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def replace(self, **kw):
        d = dict(self.__dict__)
        d.update(kw)
        return _AtomView(**d)


def make_slab_step(cfg, aux, mesh: Mesh):
    """Returns a jitted step: SlabState x ForceField -> SlabState."""
    n_dev = mesh.devices.size
    check_slab_cfg(cfg, n_dev)
    nloc = cfg.grid.dims[0] // n_dev
    _, M = slab_caps(cfg, n_dev)
    fdt = cfg.jnp_dtype
    photons = aux.photons if aux is not None else None
    ewald_rk = aux.rk if aux is not None else None
    ewald_w = aux.kweights if aux is not None else None
    if cfg.elec_type == ELEC_EWALD and ewald_rk is None:
        raise ValueError("Ewald deck needs aux.rk/kweights "
                         "(runtime.setup builds them)")

    from .slab_react import reactive_mode, reactive_pass
    reactive = reactive_mode(cfg)

    def local_step(st: SlabState, ff):
        valid = st.gid >= 0
        st_dict = {k: getattr(st, k) for k in PER_SLOT}

        # --- [Nose] start-of-step scaling with the PREVIOUS step's
        # kinetic energy (replicated scalar) — the single-device step
        # does the same (main.cu:291-299, step.py) ---
        chit, consint = st.chit, st.consint
        if cfg.tstat_type == TSTAT_NOSE:
            v0, _, chit, consint = tstat.nose_apply(
                cfg, st_dict["vel"], st.energies.kin, chit, consint)
            st_dict["vel"] = jnp.where(valid[:, None], v0, 0)

        # --- verlet 1: pass zeroed accumulators to get pure deltas ---
        nsp = st.cross_pos.shape[0]
        view = _AtomView(pos=st_dict["pos"], vel=st_dict["vel"],
                         frc=st_dict["frc"], types=st_dict["types"],
                         pos_mom=jnp.zeros((3,), fdt),
                         neg_mom=jnp.zeros((3,), fdt),
                         cross_pos=jnp.zeros((nsp, 3), jnp.int32),
                         cross_neg=jnp.zeros((nsp, 3), jnp.int32))
        upd, eng_field = integ.verlet1(cfg, ff, view)
        # empty slots must stay all-zero (ext-field force reset writes
        # a per-charge constant into every row)
        st_dict["pos"] = jnp.where(valid[:, None], upd["pos"], 0)
        st_dict["vel"] = jnp.where(valid[:, None], upd["vel"], 0)
        st_dict["frc"] = jnp.where(valid[:, None], upd["frc"], 0)
        pos_mom = st.pos_mom + jax.lax.psum(upd["pos_mom"], AXIS)
        neg_mom = st.neg_mom + jax.lax.psum(upd["neg_mom"], AXIS)
        cross_pos = st.cross_pos + jax.lax.psum(upd["cross_pos"], AXIS)
        cross_neg = st.cross_neg + jax.lax.psum(upd["cross_neg"], AXIS)
        eng_field = jax.lax.psum(eng_field, AXIS)

        # --- migration ---
        st_dict, valid, n_mig, n_lost, n_defer = _migrate(
            cfg, n_dev, nloc, M, st_dict, valid)
        mig_total = (st.mig_total
                     + jax.lax.psum(n_mig, AXIS)).astype(jnp.int32)
        mig_lost = (st.mig_lost
                    + jax.lax.psum(n_lost, AXIS)).astype(jnp.int32)
        mig_defer = (st.mig_defer
                     + jax.lax.psum(n_defer, AXIS)).astype(jnp.int32)

        # --- reactive topology, pre-pair stage: bond forces + repair/
        # mutation on the replicated global view (mirrors step.py's
        # apply_bonds-before-pair order so type mutations feed the
        # pair pass exactly like single-chip) ---
        rg = st.rg
        rng = st.rng
        e_bond = jnp.zeros((), fdt)
        e_angle = jnp.zeros((), fdt)
        if reactive:
            stage2, frc_b, e_bond, st_dict, rg = reactive_pass(
                cfg, ff, cfg.n_at, st_dict, valid, rg, rng, st.step)
            st_dict["frc"] = st_dict["frc"] + frc_b

        # --- pair pass on the extended slab ---
        pfrc, e_vdw, e_coul, occ = _pair_pass(cfg, ff, n_dev,
                                              st_dict, valid)
        st_dict["frc"] = st_dict["frc"] + pfrc
        e_vdw = jax.lax.psum(e_vdw, AXIS)
        e_coul = jax.lax.psum(e_coul, AXIS)
        slab_occ = jnp.maximum(st.slab_occ,
                               jax.lax.pmax(occ, AXIS)).astype(jnp.int32)

        # --- constant bonds + angles (per-atom records, gid table) ---
        bond_miss = st.bond_miss
        if (cfg.use_bnd or cfg.use_angl) and not reactive:
            bfrc, eb, ea, miss = _bonded_pass(cfg, ff, n_dev,
                                              st_dict, valid)
            st_dict["frc"] = st_dict["frc"] + bfrc
            e_bond = jax.lax.psum(eb, AXIS).astype(fdt)
            e_angle = jax.lax.psum(ea, AXIS).astype(fdt)
            bond_miss = (bond_miss
                         + jax.lax.psum(miss, AXIS)).astype(jnp.int32)

        # --- Ewald reciprocal space: partial S(k) per slab, one psum
        # (cuElec.cu:151-382; energy is replicated, forces local) ---
        e_coul2 = jnp.zeros((), fdt)
        if cfg.elec_type == ELEC_EWALD:
            from ..ops.elec import ewald_recip
            charge = jnp.where(valid,
                               ff.spec_charge[st_dict["types"]], 0.0)
            frc_r, e_coul2 = ewald_recip(cfg, st_dict["pos"], charge,
                                         ewald_rk, ewald_w, axis=AXIS)
            st_dict["frc"] = st_dict["frc"] + \
                jnp.where(valid[:, None], frc_r, 0.0)

        # --- reactive topology, post-pair stage: create_bonds ->
        # e-jumps -> angles on the replicated view (step.py order) ---
        if reactive:
            frc_post, e_angle, rg, rng = stage2(rg, rng)
            st_dict["frc"] = st_dict["frc"] + frc_post
            st_dict["types"] = jnp.where(
                valid, rg.types[jnp.clip(st_dict["gid"], 0, cfg.n_at - 1)],
                0)
            if cfg.use_bnd:
                from ..ops.bonds import bond_means as _bond_means
                rg = _bond_means(cfg, rg)

        # --- verlet 2 (global kinetic energy) ---
        vel, _ = integ.verlet2(cfg, ff, st_dict["vel"], st_dict["frc"],
                               st_dict["types"])
        vel = jnp.where(valid[:, None], vel, 0)
        mass = ff.spec_mass[st_dict["types"]]
        ekin_loc = 0.5 * jnp.sum(jnp.where(
            valid, mass * jnp.sum(vel * vel, axis=-1), 0))
        eng_kin = jax.lax.psum(ekin_loc, AXIS)
        st_dict["vel"] = vel

        # --- thermostat ---
        eng_temp = jnp.zeros((), fdt)
        # rng was threaded through the reactive pass (Metropolis
        # splits); chit/consint carry the start-of-step Nose update
        if cfg.n_equil and cfg.freq_equil:
            do_scale = (st.step <= cfg.n_equil) & \
                (st.step % cfg.freq_equil == 0)
            vel_s, ek_s = tstat.temp_scale(cfg, st_dict["vel"], eng_kin)
            st_dict["vel"] = jnp.where(do_scale, vel_s, st_dict["vel"])
            eng_kin = jnp.where(do_scale, ek_s, eng_kin)
        if cfg.tstat_type == TSTAT_NOSE:
            v2, eng_kin, chit, consint = tstat.nose_apply(
                cfg, st_dict["vel"], eng_kin, chit, consint)
            st_dict["vel"] = jnp.where(valid[:, None], v2, 0)
        elif cfg.tstat_type == TSTAT_RADI:
            tview = _AtomView(pos=st_dict["pos"], vel=st_dict["vel"],
                              engs=st_dict["engs"],
                              types=st_dict["types"],
                              rng=rng, step=st.step)
            v2, engs, radii, et_loc, rng = tstat.tstat_radiative(
                cfg, ff, tview, photons, gid=st_dict["gid"],
                valid=valid)
            st_dict["vel"] = jnp.where(valid[:, None], v2, 0)
            st_dict["engs"] = engs
            st_dict["radii"] = jnp.where(valid, radii, 0)
            eng_temp = jax.lax.psum(et_loc, AXIS)

        # --- energies + pressure (replicated scalars) ---
        e_coul3 = jnp.asarray(cfg.eng_ewald_const, fdt)
        pot = e_coul + e_coul2 + e_coul3 + e_vdw + e_bond + e_angle
        energies = Energies(
            kin=eng_kin.astype(fdt), vdw=e_vdw.astype(fdt),
            coul1=e_coul.astype(fdt),
            coul2=e_coul2.astype(fdt), coul3=e_coul3,
            bond=e_bond, angle=e_angle,
            temp=eng_temp.astype(fdt), field=eng_field.astype(fdt),
            pot=pot.astype(fdt), tot=(pot + eng_kin).astype(fdt))

        pview = _AtomView(pos=st_dict["pos"], i_mom=st.i_mom,
                          step=st.step, pressure=st.pressure,
                          pos_mom=pos_mom, neg_mom=neg_mom,
                          mom_buf_pos=st.mom_buf_pos,
                          mom_buf_neg=st.mom_buf_neg)
        pres, buf_p, buf_n, i_mom = integ.pressure_update(cfg, pview)

        return st.replace(
            energies=energies, pressure=pres,
            pos_mom=pos_mom, neg_mom=neg_mom,
            mom_buf_pos=buf_p, mom_buf_neg=buf_n, i_mom=i_mom,
            cross_pos=cross_pos, cross_neg=cross_neg,
            mig_total=mig_total, mig_lost=mig_lost,
            mig_defer=mig_defer, slab_occ=slab_occ,
            bond_miss=bond_miss, rg=rg,
            rng=rng, chit=chit, consint=consint,
            step=st.step + 1, **st_dict)

    specs = state_specs(mesh, reactive=reactive)
    ff_specs = None  # replicated

    def step(st, ff):
        ff_spec = jax.tree_util.tree_map(lambda _: P(), ff)
        fn = shard_map(local_step, mesh=mesh,
                       in_specs=(specs, ff_spec), out_specs=specs,
                       check_vma=False)
        return fn(st, ff)

    return jax.jit(step)


def make_slab_multi_step(cfg, aux, mesh: Mesh):
    """n-step scanned slab loop (n static)."""
    n_dev = mesh.devices.size
    check_slab_cfg(cfg, n_dev)
    nloc = cfg.grid.dims[0] // n_dev
    _, M = slab_caps(cfg, n_dev)
    step1 = make_slab_step(cfg, aux, mesh)

    def multi(st, ff, n: int):
        def body(s, _):
            return step1(s, ff), None
        st, _ = jax.lax.scan(body, st, None, length=n)
        return st

    return jax.jit(multi, static_argnums=2)


def _make_local_rdf_sample(cfg, rcfg, spec_nuclei, nucl_number):
    """Per-device RDF sample over the slab slots (runs inside a
    shard_map on the slab axis): each device histograms its OWNED rows
    against the psum-assembled global position table
    (ops.rdf.rdf_counts_rows) and one psum merges the integer counts —
    bit-identical to the single-chip histogram."""
    from ..ops import rdf as ops_rdf
    from .slab_react import assemble_global

    N = cfg.n_at
    nsp = cfg.n_spec
    snuc = np.asarray(spec_nuclei, np.int32)
    nnum = np.asarray(nucl_number, np.int32)

    # size gate, same rule as the single-chip rdf_sample dispatch: the
    # rows-vs-global broadcast is O(C * N) (41e9 elements at 320k
    # atoms / 4 devices — int32 overflow + impossible compute, found
    # by tools/bench_mesh_bigN.py); past the point where the cell
    # candidate matrix is smaller, sweep the RDF grid instead.
    use_cells = N > len(rcfg.grid.stencil) * rcfg.grid.cap

    def local_sample(st, h, nh):
        valid = st.gid >= 0
        gid = jnp.where(valid, st.gid, -1)
        pos_g = assemble_global(N, st.gid, valid, st.pos, AXIS)
        types_g = assemble_global(N, st.gid, valid, st.types, AXIS)
        if use_cells:
            counts = ops_rdf.rdf_counts_rows_cells(
                cfg, rcfg, st.pos, gid, st.types, pos_g, types_g)
        else:
            counts = ops_rdf.rdf_counts_rows(cfg, rcfg, st.pos, gid,
                                             st.types, pos_g, types_g)
        counts = jax.lax.psum(counts, AXIS)
        # live species counts (reactive mutations change them) from
        # the OWNED valid slots — a gid lost to a migration deletion
        # then counts as missing, not as species 0 (the zero-filled
        # assembled table would skew the normalization)
        spec_number = jax.lax.psum(jnp.sum(
            valid[:, None]
            & (st.types[:, None]
               == jnp.arange(nsp, dtype=jnp.int32)[None, :]),
            axis=0, dtype=jnp.int32), AXIS)
        return ops_rdf._apply_weights(cfg, rcfg, counts, spec_number,
                                      jnp.asarray(snuc),
                                      jnp.asarray(nnum), h, nh)

    return local_sample


def make_slab_rdf_chunk(cfg, rcfg, aux, mesh: Mesh, spec_nuclei,
                        nucl_number, p_rdf: int):
    """Fused slab chunk: scan ``p_rdf``-step blocks and accumulate the
    RDF histogram ON DEVICE at each block boundary — the mesh analog of
    the runner's single-chip rdf_in_chunk program, so `run --mesh N`
    stops paying a host-side gather of every per-atom array per RDF
    sample.
    """
    from .slab_react import reactive_mode

    n_dev = mesh.devices.size
    check_slab_cfg(cfg, n_dev)
    step1 = make_slab_step(cfg, aux, mesh)
    local_sample = _make_local_rdf_sample(cfg, rcfg, spec_nuclei,
                                          nucl_number)

    specs = state_specs(mesh, reactive=reactive_mode(cfg))
    nh_spec = P() if rcfg.nuclei else None
    sample = shard_map(local_sample, mesh=mesh,
                       in_specs=(specs, P(), nh_spec),
                       out_specs=(P(), nh_spec), check_vma=False)

    def chunk(st, h, nh, ff, n: int):
        n_blocks, rem = divmod(n, p_rdf)

        def steps(st, r):
            def ibody(s, _):
                return step1(s, ff), None
            st, _ = jax.lax.scan(ibody, st, None, length=r)
            return st

        def body(carry, _):
            st, h, nh = carry
            st = steps(st, p_rdf)
            h, nh = sample(st, h, nh)
            return (st, h, nh), None

        if n_blocks:
            (st, h, nh), _ = jax.lax.scan(body, (st, h, nh), None,
                                          length=n_blocks)
        if rem:
            st = steps(st, rem)
        return st, h, nh

    return jax.jit(chunk, static_argnums=4)


# ----------------------------------------------------------------------
def _make_local_stat_row(cfg, spec_counts0, pos0):
    """Per-device stat-row builder over the slab slots (runs inside a
    shard_map on the slab axis).  Emits the SAME (frow, irow) layout as
    runtime.statring.make_stat_row so the runner's flush decoder works
    unchanged; the per-atom reductions (displacement MSD, x1, live
    species counts, constant-topology bond count) psum over the mesh.
    The irow "over" slots carry the slab health monitors
    [slab_occ, mig_lost, mig_defer, bond_miss] instead of the
    single-chip neighbor monitors (the runner decodes per mode)."""
    from ..runtime.statring import ENG_KEYS

    N = cfg.n_at
    nsp = cfg.n_spec
    counts = jnp.asarray(np.maximum(np.asarray(spec_counts0), 1),
                         jnp.float32)
    sp_ids = jnp.asarray(np.arange(nsp, dtype=np.int32))
    pos0_h = np.asarray(pos0)
    reactive = cfg.use_bnd == 2 or cfg.use_angl == 2 or cfg.ejtype != 0
    nbt = max(cfg.n_bond_types, 1)

    def stat_row(st: SlabState):
        E = st.energies
        dt = st.pos.dtype
        valid = st.gid >= 0
        gsafe = jnp.clip(st.gid, 0, N - 1)
        # per-species mean |r(t)-r(0)|^2, minimum image, from the
        # replicated constant pos0 table keyed by gid
        p0 = jnp.asarray(pos0_h.astype(np.dtype(dt.name)))[gsafe]
        d = st.pos - p0
        box = jnp.asarray(cfg.box, dt)
        d = d - box * jnp.round(d / box)
        r2 = jnp.where(valid, jnp.sum(d * d, axis=1), 0)
        oh = (valid[:, None]
              & (st.types[:, None] == sp_ids[None, :])).astype(dt)
        msd = jax.lax.psum((r2[None, :] @ oh)[0], AXIS) \
            .astype(jnp.float32) / counts
        # x1 = x of global atom 0 (owned by exactly one slot mesh-wide)
        x1 = jax.lax.psum(
            jnp.sum(jnp.where(st.gid == 0, st.pos[:, 0], 0)), AXIS)

        rg = st.rg
        if reactive:
            spec_number = rg.spec_number
            n_bond = rg.n_bond
            bt_count, bt_r, bt_lt = rg.bt_count, rg.bt_r_mean, rg.bt_lt_mean
            n_jump, j_pos, j_neg = rg.n_jump, rg.jump_pos, rg.jump_neg
        else:
            spec_number = jax.lax.psum(
                jnp.sum(oh, axis=0, dtype=jnp.float32), AXIS) \
                .astype(jnp.int32)
            if cfg.use_bnd:
                # each side of a bond holds a record: count/2
                n_bond = (jax.lax.psum(jnp.sum(jnp.where(
                    valid[:, None], (st.bnd_type != 0).astype(jnp.int32),
                    0)), AXIS) + 1) // 2
            else:
                n_bond = jnp.zeros((), jnp.int32)
            bt_count = jnp.zeros((nbt,), jnp.int32)
            bt_r = jnp.zeros((nbt,), jnp.float32)
            bt_lt = jnp.zeros((nbt,), jnp.float32)
            n_jump = j_pos = j_neg = jnp.zeros((), jnp.int32)

        frow = jnp.concatenate([
            jnp.stack([getattr(E, k).astype(jnp.float32)
                       for k in ENG_KEYS]),
            st.pos_mom.astype(jnp.float32),
            st.neg_mom.astype(jnp.float32),
            st.pressure.astype(jnp.float32)[None],
            x1.astype(jnp.float32)[None],
            msd,
            bt_r.astype(jnp.float32),
            bt_lt.astype(jnp.float32),
        ])
        irow = jnp.concatenate([
            st.step[None],
            spec_number,
            st.cross_pos.reshape(-1),
            st.cross_neg.reshape(-1),
            n_bond[None], n_jump[None], j_pos[None], j_neg[None],
            jnp.stack([st.slab_occ, st.mig_lost, st.mig_defer,
                       st.bond_miss, jnp.zeros((), jnp.int32),
                       jnp.zeros((), jnp.int32),
                       jnp.zeros((), jnp.int32)]),
            bt_count,
        ]).astype(jnp.int32)
        return frow, irow

    return stat_row


def make_slab_ring(cfg, aux, mesh: Mesh, rcfg, spec_nuclei, nucl_number,
                   p_stat: int, p_rdf: int, spec_counts0, pos0):
    """Mesh-mode on-device stat ring: scan ``n_samples`` stat periods
    per dispatch, emitting one (frow, irow) sample row per period and
    accumulating the RDF histogram at every ``p_rdf`` sub-block — the
    slab analog of the runner's single-chip ring
    (runtime/statring.py; reference: cuStat.cu:17-71 write_stat +
    :387-404 stat_iter buffered flush).  One host dispatch then covers
    dozens of stat periods, which on real multi-chip hardware is the
    difference between tunnel-round-trip-bound and device-bound
    end-to-end throughput (the round-2 single-chip lesson: 135 -> 1030
    steps/s).

    Returns ring(st, h, nh, ff, n_samples) ->
    (st, h, nh, frows, irows); n_samples is static.
    """
    from .slab_react import reactive_mode

    n_dev = mesh.devices.size
    check_slab_cfg(cfg, n_dev)
    step1 = make_slab_step(cfg, aux, mesh)
    specs = state_specs(mesh, reactive=reactive_mode(cfg))
    fuse_rdf = rcfg is not None and p_rdf > 0
    if fuse_rdf and p_stat % p_rdf:
        raise ValueError("mesh ring needs p_rdf | p_stat")

    stat_row = shard_map(
        _make_local_stat_row(cfg, spec_counts0, pos0), mesh=mesh,
        in_specs=(specs,), out_specs=(P(), P()), check_vma=False)
    if fuse_rdf:
        nh_spec = P() if rcfg.nuclei else None
        sample = shard_map(
            _make_local_rdf_sample(cfg, rcfg, spec_nuclei, nucl_number),
            mesh=mesh, in_specs=(specs, P(), nh_spec),
            out_specs=(P(), nh_spec), check_vma=False)

    def steps(st, ff, r):
        def ibody(s, _):
            return step1(s, ff), None
        st, _ = jax.lax.scan(ibody, st, None, length=r)
        return st

    def ring(st, h, nh, ff, n_samples: int):
        def body(carry, _):
            st, h, nh = carry
            if fuse_rdf:
                def sub(c, _):
                    st, h, nh = c
                    st = steps(st, ff, p_rdf)
                    h, nh = sample(st, h, nh)
                    return (st, h, nh), None
                (st, h, nh), _ = jax.lax.scan(
                    sub, (st, h, nh), None, length=p_stat // p_rdf)
            else:
                st = steps(st, ff, p_stat)
            return (st, h, nh), stat_row(st)

        (st, h, nh), (frows, irows) = jax.lax.scan(
            body, (st, h, nh), None, length=n_samples)
        return st, h, nh, frows, irows

    return jax.jit(ring, static_argnums=4, donate_argnums=(0, 1, 2))
