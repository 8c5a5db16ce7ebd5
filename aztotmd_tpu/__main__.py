"""Command-line interface.

``python -m aztotmd_tpu run <deck_dir>`` plays the role of the reference's
``aztotmd`` executable (src/main.cu:239): reads control.txt / field.txt /
atoms.xyz (+ optional bonds.txt / angles.txt / cuda.txt) from the deck
directory, runs the simulation, writes the output files.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="aztotmd_tpu",
                                description="TPU-native azTotMD")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run a simulation deck directory")
    r.add_argument("deck", help="directory with control.txt/field.txt/"
                                "atoms.xyz")
    r.add_argument("-o", "--out", default=".", help="output directory")
    r.add_argument("--steps", type=int, default=None,
                   help="override nstep from control.txt")
    r.add_argument("--dtype", choices=("f32", "f64"), default="f32",
                   help="compute precision (f32 = reference GPU parity)")
    r.add_argument("--seed", type=int, default=12345)
    r.add_argument("--quiet", action="store_true")
    r.add_argument("--checkpoint-every", type=int, default=0,
                   help="write checkpoint.npz every N steps")
    r.add_argument("--resume", default=None,
                   help="checkpoint.npz to resume from")
    r.add_argument("--debug", action="store_true",
                   help="check state invariants after every chunk "
                        "(the reference's DEBUG_MODE verify kernels)")
    r.add_argument("--profile", default=None, metavar="LOG_DIR",
                   help="capture a JAX profiler trace into LOG_DIR and "
                        "print per-stage timings")
    r.add_argument("--timings", action="store_true",
                   help="print per-stage wall-clock timings without the "
                        "profiler trace (trace capture over the axon "
                        "tunnel costs ~10 ms/step by itself)")
    r.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="run over an N-device mesh (see --mesh-mode)")
    r.add_argument("--mesh-mode", choices=("slab", "atoms"),
                   default="slab",
                   help="slab: spatial decomposition with migration "
                        "(non-reactive/constant-topology decks, scales "
                        "compute AND memory); atoms: atom-sharded with "
                        "XLA-propagated collectives (full feature set "
                        "incl. reactive topology)")
    r.add_argument("--no-bond-equil-hack", action="store_true",
                   help="disable the reference's reactive-bond "
                        "velocity-zeroing equilibration hack "
                        "(cuBonds.cu:622-627)")

    b = sub.add_parser("bench", help="benchmark a deck (steps/sec)")
    b.add_argument("deck")
    b.add_argument("--steps", type=int, default=200)
    b.add_argument("--warmup", type=int, default=20)
    b.add_argument("--dtype", choices=("f32", "f64"), default="f32")

    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "ignores JAX_PLATFORMS; combine with "
                        "XLA_FLAGS=--xla_force_host_platform_device_"
                        "count=N for a virtual mesh)")
    args = p.parse_args(argv)

    if args.cpu or os.environ.get("AZTOTMD_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    if getattr(args, "dtype", None) == "f64":
        # without x64, jnp.asarray silently truncates every f64 request
        # to f32 (observed on the TPU backend, round 5) — the
        # validation mode must actually validate
        import jax
        jax.config.update("jax_enable_x64", True)

    if args.cmd == "run":
        from .runtime.runner import MDRunner
        from .runtime.setup import load_deck_dir
        sysd = load_deck_dir(args.deck, dtype=args.dtype, seed=args.seed)
        if args.no_bond_equil_hack:
            import dataclasses
            sysd["cfg"] = dataclasses.replace(sysd["cfg"],
                                              bond_equil_hack=False)
        if args.resume:
            from .runtime.checkpoint import load_checkpoint
            sysd["state"] = load_checkpoint(args.resume, sysd["state"])
            print(f"resumed from {args.resume} at step "
                  f"{int(sysd['state'].step)}", file=sys.stderr)
        runner = MDRunner(sysd, out_dir=args.out, quiet=args.quiet,
                          checkpoint_every=args.checkpoint_every,
                          profile=args.profile is not None or args.timings,
                          debug=args.debug,
                          append=args.resume is not None,
                          mesh_devices=args.mesh,
                          mesh_mode=args.mesh_mode)
        if args.profile:
            from .utils import trace
            with trace(args.profile):
                runner.run(args.steps)
        else:
            runner.run(args.steps)
        runner.finalize()
    elif args.cmd == "bench":
        import json
        import time

        import jax

        from .runtime.setup import load_deck_dir
        from .runtime.step import make_step
        sysd = load_deck_dir(args.deck, dtype=args.dtype)
        step = jax.jit(make_step(sysd["cfg"], sysd["aux"]),
                       donate_argnums=0)
        state, ff = sysd["state"], sysd["ff"]
        for _ in range(args.warmup):
            state = step(state, ff)
        jax.block_until_ready(state.pos)
        t0 = time.time()
        for _ in range(args.steps):
            state = step(state, ff)
        jax.block_until_ready(state.pos)
        dt = time.time() - t0
        print(json.dumps({"steps_per_sec": round(args.steps / dt, 2),
                          "n_at": sysd["cfg"].n_at}))


if __name__ == "__main__":
    main()
