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
  -M/-multi            treat every -f file as an INDEPENDENT chain with its
                       own priors/RNG/outputs (new; the reference's per-
                       chromosome WGS workflow, bin/samToCounts:5-7);
                       chains run DEVICE-PARALLEL, one local device each
                       (sequential when combined with -D: then each chain
                       is position-sharded over the mesh instead)
"""

from __future__ import annotations

import sys
import time

from hammlet_tpu.io.input import ValueStream, read_values
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
    "-multi": "-M",
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


_REGISTERED = set(_DEFAULTS) | {
    "-v", "-g", "-h", "-w", "-a", "-S", "-f", "-R", "-C", "-D", "-M",
}


def _looks_numeric(tok: str) -> bool:
    """A '-'-prefixed token that is a negative number, not a flag typo."""
    return len(tok) > 1 and (tok[1].isdigit() or tok[1] == ".")


def parse_args(argv: list[str]) -> dict[str, list[str]]:
    """Registered-flag tokenizer (src/Parser.hpp:142-193): every token after
    a registered flag and before the next one belongs to that flag.
    Duplicate and positional-first errors mirror the reference; unregistered
    '-x' tokens are rejected up front (the reference's parser swallows them
    as parameters and fails later with a conversion error — failing fast
    here prevents a typo like '-q' from silently corrupting a flag's
    arguments; PARITY.md)."""
    out: dict[str, list[str]] = {}
    cur: str | None = None
    for tok in argv:
        canon = _FLAG_ALIASES.get(tok, tok)
        if canon in _REGISTERED:
            if canon in out:
                raise SystemExit(f"Duplicate flag {tok}!")
            cur = canon
            out[cur] = []
        elif tok.startswith("-") and not _looks_numeric(tok):
            raise SystemExit(f"Unknown flag {tok}!")
        else:
            if cur is None:
                raise SystemExit(
                    f"First input token ({tok}) is not a registered flag; "
                    "parser does not support positional arguments!"
                )
            out[cur].append(tok)
    return out


def _conv(conv, s: str):
    """Typed token conversion with the reference's error text
    (Parser.hpp:46-54)."""
    try:
        return conv(s)
    except (TypeError, ValueError):
        raise ValueError(f'Conversion failed for string "{s}"!')


def _parse_at(tokens: list[str], index: int, conv, flag: str):
    """parse<T>(flag, index) with the reference's bounds error
    (Parser.hpp:196-208)."""
    if index >= len(tokens):
        raise ValueError(f"Not enough arguments for flag {flag}!")
    return _conv(conv, tokens[index])


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
    from hammlet_tpu.parallel.distributed import initialize_from_env
    from hammlet_tpu.runner import enable_compilation_cache

    # multi-host runtime: HAMMLET_NUM_PROCESSES & friends start
    # jax.distributed before any backend use; jax.devices() then spans hosts
    # and -D shards the position axis over the process-spanning mesh
    initialize_from_env()
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
        # reference dump format (Parser.hpp:242-269): one line per flag
        # group listing every alias, set-marker, then effective tokens
        groups: dict[str, list[str]] = {c: [c] for c in sorted(_REGISTERED)}
        for alias, canon in _FLAG_ALIASES.items():
            groups[canon].append(alias)
        for canon, aliases in groups.items():
            mark = "*" if canon in args else " "
            print(f"[{mark}] {' '.join(aliases)} : {' '.join(get(canon))}")

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

    seed = (
        _parse_at(args["-R"], 0, int, "-R")
        if args.get("-R")
        else int(time.time())
    )

    # state / mapping spec (main.cpp:117-137)
    s_tokens = get("-s")
    if len(s_tokens) == 1:
        nr_params, nr_dim = _parse_at(s_tokens, 0, int, "-s"), 1
    else:
        if s_tokens[0] in ("I", "independent"):
            # accepted by the reference's parser but unimplemented there too
            # (Mapping.hpp:110-111)
            raise ValueError('Mapping type "independent" not implemented yet!')
        if s_tokens[0] not in ("C", "combinations"):
            raise ValueError(f"Unknown mapping type {s_tokens[0]}!")
        nr_params = _parse_at(s_tokens, 1, int, "-s")
        nr_dim = _parse_at(s_tokens, 2, int, "-s") if len(s_tokens) >= 3 else 1

    t_tokens = get("-t")
    trans = _parse_at(t_tokens, 0, float, "-t")
    self_trans = (
        _parse_at(t_tokens, 1, float, "-t") if len(t_tokens) > 1 else trans
    )
    initial_alpha = _parse_at(get("-I"), 0, float, "-I")
    weight_multiplier = _parse_at(get("-m"), 0, float, "-m")
    use_self = "-S" not in args

    e_tokens = get("-e")
    if e_tokens[0] != "normal":
        raise ValueError(f"Emission type {e_tokens[0]} unknown or not implemented yet!")
    if "-a" not in args:
        raise ValueError("Manual theta priors not implemented, use -a!")
    s2 = _parse_at(e_tokens, 1, float, "-e")
    p = _parse_at(e_tokens, 2, float, "-e")

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

    # -M: every -f file is an INDEPENDENT chain (the reference's WGS
    # workflow runs one process per chromosome, bin/samToCounts:5-7), each
    # with its own auto-priors, RNG stream, and output files
    # {prefix}{filestem}-*{suffix}. The chains are DEVICE-PARALLEL: each is
    # pinned to a local device via the thread-local default_device and runs
    # its unchanged single-device program in its own thread (XLA execution
    # releases the GIL), so N chromosomes on an N-device mesh finish in
    # ~the time of one and the outputs are byte-identical to a sequential
    # run by construction. Combining -M with -D reverts to sequential
    # chains, each position-sharded over the mesh.
    if "-M" in args:
        import os as _os

        files = args.get("-f") or []
        if len(files) < 1:
            raise ValueError("-M requires at least one -f input file")
        subs = []
        for fpath in files:
            stem = _os.path.basename(fpath)
            if stem.endswith(".gz"):
                stem = stem[:-3]
            stem = stem.rsplit(".", 1)[0]
            sub = {k: list(v) for k, v in args.items()}
            del sub["-M"]
            sub["-f"] = [fpath]
            sub["-o"] = [f"{opref}{stem}-", osuff]
            subs.append(sub)

        import jax

        devices = jax.local_devices()
        if len(subs) > 1 and len(devices) > 1 and "-D" not in args:
            from concurrent.futures import ThreadPoolExecutor

            def run_chain(item):
                i, sub = item
                with jax.default_device(devices[i % len(devices)]):
                    return _run(sub)

            with ThreadPoolExecutor(max_workers=len(devices)) as ex:
                rcs = list(ex.map(run_chain, enumerate(subs)))
            return max(rcs)
        rc = 0
        for sub in subs:
            rc |= _run(sub)
        return rc

    n_devices = _parse_at(args["-D"], 0, int, "-D") if args.get("-D") else 1

    # sharded runs stream the input: the provider hands the ingest one
    # token range at a time (each process reads only its own shards' byte
    # ranges ~2x), so a multi-Gbp file never materializes on any host —
    # the reference's one-pass istream ingest property (wavelet.hpp:98-188)
    stream = None
    if n_devices > 1 and args.get("-f"):
        stream = ValueStream(args["-f"], nr_dim)
        data, T = stream, stream.T
    else:
        data = read_values(args.get("-f"), nr_dim)
        T = data.shape[0]
    if verbose:
        print(f"Output will be written to {opref}*{osuff}")
        print(f"Number of data points: {T}")
        print("Calculating Haar breakpoint weights")

    # single writer: in a multi-host run only the primary process opens
    # output files (Records.hpp:52-70 has one writer by construction);
    # every other rank participates in the collectives with an inert hub
    from hammlet_tpu.parallel.distributed import is_primary

    records = Records(
        T,
        opref,
        osuff,
        nr_params**nr_dim,
        outputs=outputs,
        overwrite=overwrite,
        write=is_primary(),
    )
    if "mapping" in outputs:
        # -O D/mapping: the state -> emission-parameter assignment is static
        # (combinations scheme), so it is written once up front. Upstream
        # registers the flag but leaves the handler an empty TODO
        # (main.cpp:249-252); we write the documented content.
        from hammlet_tpu.models.mapping import combinations_mapping

        records.save_mapping(combinations_mapping(nr_dim, nr_params))
    if n_devices > 1:
        from hammlet_tpu.parallel import make_sharded_engine, position_mesh

        engine = make_sharded_engine(
            data,
            mesh=position_mesh(n_devices),
            T=T,
            dim=nr_dim,
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
        if stream is not None:
            stream.close()
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
            _parse_at(args["-C"], 1, int, "-C") if len(args["-C"]) > 1 else 100
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
