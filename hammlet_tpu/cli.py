"""Command-line front end, flag-compatible with the reference binary.

Flag grammar per src/main.cpp:33-65 and doc/hammlet-manpage.md:33-176:

  -v/-verbose          progress output
  -g/-arguments        dump parsed arguments
  -h/-help             help text
  -f/-input-file F...  input file(s) (default: stdin)
  -o/-output-pattern PREFIX SUFFIX   (default derived from -f)
  -O/-output-data  [marginals sequences parameters blocks compression
                    mapping segments] (long or one-letter forms)
  -w/-overwrite        allow overwriting outputs
  -s/-states [C] P [D] number of emission distributions / mapping spec
  -e/-emissions normal s2 p   emission type + autoprior parameters
  -a/-auto-priors      automatic hyperparameters (required, as in reference)
  -t/-transitions a [d]  transition Dirichlet alphas (off-diag, diag)
  -S/-no-self-transitions
  -I/-initial-dist a   initial-distribution Dirichlet alpha
  -R/-random-seed N    RNG seed (default: time)
  -i/-iterations SCHEME  sampling scheme DSL (P, S, D, {F,M} iter thin)
  -m/-weight-multiplier X
  -C/-checkpoint PATH [EVERY]  periodic checkpointing (new; resumes from
                               PATH automatically when it exists)
  -D/-devices N        shard the position axis over N devices (new; default
                       1 = single-device engine)
"""

from __future__ import annotations

import sys
import time

from hammlet_tpu.io.input import read_values
from hammlet_tpu.io.records import Records
from hammlet_tpu.runner import make_engine

_FLAG_ALIASES = {
    "-verbose": "-v",
    "-arguments": "-g",
    "-help": "-h",
    "--help": "-h",
    "-input-file": "-f",
    "-output-pattern": "-o",
    "-output-data": "-O",
    "-overwrite": "-w",
    "-states": "-s",
    "-emissions": "-e",
    "-auto-priors": "-a",
    "-transitions": "-t",
    "-no-self-transitions": "-S",
    "-initial-dist": "-I",
    "-random-seed": "-R",
    "-iterations": "-i",
    "-weight-multiplier": "-m",
    "-checkpoint": "-C",
    "-devices": "-D",
}

_DEFAULTS = {
    "-o": ["hammlet-", ".csv"],
    "-O": ["marginals"],
    "-s": ["3"],
    "-e": ["normal", "0.2", "0.9"],
    "-t": ["0.5", "0.5"],
    "-I": ["0.5"],
    "-i": ["M", "500", "0", "S", "P", "F", "200", "0", "F", "300", "3"],
    "-m": ["1"],
}

_OUTPUT_ALIASES = {
    "M": "marginals",
    "S": "sequences",
    "P": "parameters",
    "B": "blocks",
    "C": "compression",
    "D": "mapping",
    "G": "segments",
}


def parse_args(argv: list[str]) -> dict[str, list[str]]:
    """Registered-flag tokenizer (src/Parser.hpp:83-305): every token after a
    registered flag and before the next one belongs to that flag."""
    out: dict[str, list[str]] = {}
    cur: str | None = None
    for tok in argv:
        canon = _FLAG_ALIASES.get(tok, tok)
        if canon.startswith("-") and (
            canon in _DEFAULTS
            or canon in ("-v", "-g", "-h", "-w", "-a", "-S", "-f", "-R", "-C", "-D")
        ):
            cur = canon
            out.setdefault(cur, [])
        else:
            if cur is None:
                raise SystemExit(f"Unexpected token {tok!r} before any flag")
            out[cur].append(tok)
    return out


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        args = parse_args(argv)
    except SystemExit as e:
        print(f"[ERROR] {e}", file=sys.stderr)
        return 1

    try:
        return _run(args)
    except Exception as e:  # mirror the reference's fatal handler
        print(f"\n[ERROR] {e}", file=sys.stderr)
        print("Terminating HaMMLET. The rest is silence.", file=sys.stderr)
        return 1


def _run(args: dict[str, list[str]]) -> int:
    from hammlet_tpu.runner import enable_compilation_cache

    enable_compilation_cache()

    def get(flag: str) -> list[str]:
        v = args.get(flag)
        return v if v else _DEFAULTS.get(flag, [])

    if "-h" in args:
        from hammlet_tpu.manpage import print_manpage

        print_manpage()
        return 0

    verbose = "-v" in args
    overwrite = "-w" in args

    if "-g" in args:
        for flag in sorted(set(args) | set(_DEFAULTS)):
            mark = "*" if flag in args else " "
            print(f"[{mark}] {flag}: {' '.join(get(flag))}")

    # output prefix/suffix (main.cpp:92-100)
    if "-o" not in args and "-f" in args and args["-f"]:
        fname = args["-f"][0]
        dot = fname.rfind(".")
        if dot < 0:
            opref, osuff = fname + "-", ""
        else:
            opref, osuff = fname[:dot] + "-", fname[dot:]
    else:
        o = get("-o")
        opref = o[0] if len(o) > 0 else "hammlet-"
        osuff = o[1] if len(o) > 1 else ".csv"

    seed = int(get("-R")[0]) if args.get("-R") else int(time.time())

    # state / mapping spec (main.cpp:117-137)
    s_tokens = get("-s")
    if len(s_tokens) == 1:
        nr_params, nr_dim = int(s_tokens[0]), 1
    else:
        if s_tokens[0] in ("I", "independent"):
            # accepted by the reference's parser but unimplemented there too
            # (Mapping.hpp:110-111)
            raise ValueError('Mapping type "independent" not implemented yet!')
        if s_tokens[0] not in ("C", "combinations"):
            raise ValueError(f"Unknown mapping type {s_tokens[0]}!")
        nr_params = int(s_tokens[1])
        nr_dim = int(s_tokens[2]) if len(s_tokens) >= 3 else 1

    t_tokens = get("-t")
    trans = float(t_tokens[0])
    self_trans = float(t_tokens[1]) if len(t_tokens) > 1 else trans
    initial_alpha = float(get("-I")[0])
    weight_multiplier = float(get("-m")[0])
    use_self = "-S" not in args

    e_tokens = get("-e")
    if e_tokens[0] != "normal":
        raise ValueError(f"Emission type {e_tokens[0]} unknown or not implemented yet!")
    if "-a" not in args:
        raise ValueError("Manual theta priors not implemented, use -a!")
    s2, p = float(e_tokens[1]), float(e_tokens[2])

    outputs = {_OUTPUT_ALIASES.get(t, t) for t in get("-O")}

    if verbose:
        K = nr_params**nr_dim
        print(f"Data dimensions: {nr_dim}")
        print(f"Emission distributions: {nr_params}")
        print(f"States: {K}")
        print(f"Sampling scheme: {' '.join(get('-i'))}")
        print(f"Random seed: {seed}")
        if "-f" in args:
            for f in args["-f"]:
                print(f"Reading {f}")
        else:
            print("Reading from standard input")

    # validate the sampling scheme before any file is created or data read
    # (the reference checks -i tokens up front, main.cpp:367-377)
    from hammlet_tpu.runner import parse_scheme

    parse_scheme(get("-i"))

    data = read_values(args.get("-f"), nr_dim)
    T = data.shape[0]
    if verbose:
        print(f"Output will be written to {opref}*{osuff}")
        print(f"Number of data points: {T}")
        print("Calculating Haar breakpoint weights")

    records = Records(
        T,
        opref,
        osuff,
        nr_params**nr_dim,
        outputs=outputs - {"mapping"},
        overwrite=overwrite,
    )
    n_devices = int(args["-D"][0]) if args.get("-D") else 1
    if n_devices > 1:
        from hammlet_tpu.parallel import make_sharded_engine, position_mesh

        engine = make_sharded_engine(
            data,
            mesh=position_mesh(n_devices),
            nr_params=nr_params,
            nr_data_dim=nr_dim,
            seed=seed,
            s2=s2,
            p=p,
            trans=trans,
            self_trans=self_trans,
            initial_alpha=initial_alpha,
            weight_multiplier=weight_multiplier,
            use_self_transitions=use_self,
            records=records,
        )
    else:
        engine = make_engine(
            data,
            nr_params=nr_params,
            nr_data_dim=nr_dim,
            seed=seed,
            s2=s2,
            p=p,
            trans=trans,
            self_trans=self_trans,
            initial_alpha=initial_alpha,
            weight_multiplier=weight_multiplier,
            use_self_transitions=use_self,
            records=records,
        )
    if "-C" in args and args["-C"]:
        import os as _os

        from hammlet_tpu.checkpoint import (
            restore_checkpoint,
            restore_sharded_checkpoint,
        )

        engine.checkpoint_path = args["-C"][0]
        engine.checkpoint_every = (
            int(args["-C"][1]) if len(args["-C"]) > 1 else 100
        )
        if _os.path.exists(engine.checkpoint_path):
            restore = (
                restore_sharded_checkpoint if n_devices > 1 else restore_checkpoint
            )
            restore(engine, engine.checkpoint_path)
            if verbose:
                print(
                    f"Resumed from {engine.checkpoint_path} at sweep "
                    f"{engine.sweeps_completed}"
                )
    engine.run_scheme(get("-i"))
    engine.finalize()
    if verbose:
        print(
            f"Sampled {engine.total_sweeps:.0f} sweeps at "
            f"{engine.sweeps_per_second:.2f} sweeps/s"
        )
        print("Exit HaMMLET")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
