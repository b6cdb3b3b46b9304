"""`python -m group_attribution_for_diffusion_models_tpu` — list the CLI surface.

Each subcommand runs as `python -m group_attribution_for_diffusion_models_tpu.cli.<name>`
(or `python -m group_attribution_for_diffusion_models_tpu <name> [args...]`).
"""

import importlib
import pkgutil
import sys


def _commands():
    from . import cli

    out = []
    for info in pkgutil.iter_modules(cli.__path__):
        if info.name.startswith("_") or info.name == "common":
            continue
        out.append(info.name)
    return sorted(out)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    names = _commands()
    if argv and argv[0] in names:
        mod = importlib.import_module(
            f"group_attribution_for_diffusion_models_tpu.cli.{argv[0]}"
        )
        return mod.main(argv[1:])
    prog = "python -m group_attribution_for_diffusion_models_tpu"
    if argv and argv[0] not in ("-h", "--help"):
        print(f"unknown command {argv[0]!r}\n", file=sys.stderr)
    print(f"usage: {prog} <command> [args...]\n\ncommands:")
    for n in names:
        doc = ""
        try:
            mod = importlib.import_module(
                f"group_attribution_for_diffusion_models_tpu.cli.{n}"
            )
            doc = (mod.__doc__ or "").strip().splitlines()[0]
        except Exception:
            pass
        print(f"  {n:32s} {doc}")
    return 0 if not argv or argv[0] in ("-h", "--help") else 2


if __name__ == "__main__":
    raise SystemExit(main())
