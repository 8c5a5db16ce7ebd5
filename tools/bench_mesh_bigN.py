"""Mesh-mode at large N (VERDICT r4 item 5): drive the 320k-atom scale
deck through `run --mesh D` on the virtual CPU mesh, prove the slab
ring program compiles AND executes, and record per-device memory:
sharded O(N/D) slot arrays vs replicated O(N) tables (pos0 /
photon-energy tables; reactive topology would add more, slab_react.py)
plus the compiled slab ring program's own per-device HBM analysis.

    python tools/bench_mesh_bigN.py [--tiles 2] [--mesh 4] [--steps 20]

Writes nothing to the repo; numbers go to BASELINE.md by hand.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import numpy as np          # noqa: E402
import jax                  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# local-host-only persistent cache: safe here (unlike the package-level
# cache, which stays TPU-only because remote-service CPU executables
# can be feature-mismatched) since every entry in THIS dir was compiled
# by this host's own CPU backend.  Makes the second compile of the big
# slab ring program (memory_analysis) and warm tool re-runs ~free.
_cache = os.path.join(os.path.expanduser("~"), ".cache", "aztotmd_tpu",
                      "xla_cpu_local")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def shard_bytes(tree):
    """(per-device bytes of sharded leaves, per-device bytes of
    replicated leaves) for a pytree of jax arrays."""
    sharded = replicated = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "sharding"):
            continue
        n_sh = len(set(d for d in leaf.sharding.device_set))
        per_dev = leaf.addressable_shards[0].data.nbytes
        if per_dev * max(n_sh, 1) <= leaf.nbytes * 1.01 and n_sh > 1 \
                and per_dev < leaf.nbytes:
            sharded += per_dev
        else:
            replicated += per_dev
    return sharded, replicated


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--mesh", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    deck = f"/tmp/big_lj_t{args.tiles}_mesh"
    if not os.path.exists(os.path.join(deck, "atoms.xyz")):
        # stat must be a multiple of the rdf period (50) or the stat
        # ring disengages (runner.ring_ok); stat=50 keeps one full ring
        # period affordable on the 1-core CPU mesh (~5-10 s/step at
        # 320k/4dev)
        subprocess.run([sys.executable, "tools/make_bigdeck.py",
                        "--tiles", str(args.tiles), "--out", deck,
                        "--steps", "400", "--stat", "50"], check=True)

    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir

    t0 = time.time()
    r = MDRunner(load_deck_dir(deck, dtype="f32"),
                 out_dir=tempfile.mkdtemp(), quiet=True,
                 mesh_devices=args.mesh, mesh_mode="slab")
    print(f"runner init {time.time() - t0:.1f} s; N={r.cfg.n_at} "
          f"mesh={args.mesh} ring_ok={r.ring_ok}", file=sys.stderr)

    t0 = time.time()
    r.run(args.steps)
    jax.block_until_ready(r.state.pos)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f} s on the 1-core CPU mesh "
          f"(compile included)", file=sys.stderr)

    sh, rep = shard_bytes(r.state)
    print(f"slab state per device: sharded {sh / 1e6:.1f} MB + "
          f"replicated {rep / 1e6:.1f} MB", file=sys.stderr)

    # the big replicated items outside SlabState
    extras = {}
    if getattr(r, "aux", None) is not None and \
            getattr(r.aux, "photons", None) is not None:
        extras["photons(N,)"] = np.asarray(r.aux.photons).nbytes
    for name in ("_pos0_tab", "_mdstate_template"):
        v = getattr(r, name, None)
        if v is not None:
            extras[name] = sum(x.nbytes for x in
                               jax.tree_util.tree_leaves(v)
                               if hasattr(x, "nbytes"))
    for k, v in extras.items():
        print(f"replicated extra {k}: {v / 1e6:.1f} MB", file=sys.stderr)

    # compiled slab ring program memory analysis (per device on CPU
    # this is the whole-program view; on real multi-chip each device
    # compiles the same SPMD program over its shard)
    try:
        fn = r._ring_fn
        ma = fn.lower(r.state, r.hist, r.nhist, r.ff, 1) \
            .compile().memory_analysis()
        if ma is not None:
            print(f"slab ring program: args "
                  f"{ma.argument_size_in_bytes / 1e6:.1f} MB, out "
                  f"{ma.output_size_in_bytes / 1e6:.1f} MB, temps "
                  f"{ma.temp_size_in_bytes / 1e6:.1f} MB",
                  file=sys.stderr)
    except Exception as e:
        print(f"memory_analysis unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
