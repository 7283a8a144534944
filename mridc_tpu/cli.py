"""Console interface: ``python -m mridc_tpu <subcommand>``.

Functional parity with reference: mridc/cli/ (``mridc run -c config``
cli/launch.py:48-61; ``mridc app`` app/launch.py:29 — rebuilt as a
dependency-free stdlib HTTP app, mridc_tpu/app/). Adds ``models`` (registry
listing) and ``sweep`` (multirun, replacing the hydra -m ProcessLauncher).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

__all__ = ["main"]


def _cmd_run(args):
    from mridc_tpu.launch import run_from_config
    from mridc_tpu.train.config import load_config

    cfg = load_config(args.config, args.overrides)
    run_from_config(cfg)


def _cmd_models(_args):
    from mridc_tpu.models import available_models

    for name in available_models():
        print(name)


def _cmd_sweep(args):
    from mridc_tpu.utils.sweep import launch_sweep

    sweep = {}
    for item in args.set or []:
        key, eq, values = item.partition("=")
        if not eq or not values:
            raise SystemExit(f"--set expects key=v1,v2,...; got {item!r}")
        sweep[key] = values.split(",")
    cfg_path = Path(args.config)
    codes = launch_sweep(
        str(cfg_path.parent), cfg_path.name, sweep, num_slots=args.num_slots, jobs_per_slot=args.jobs_per_slot
    )
    # signal-killed jobs have NEGATIVE return codes — max() would mask them
    sys.exit(0 if all(c == 0 for c in codes) else 1)


def _cmd_app(args):
    from mridc_tpu.app.server import serve

    serve(host=args.host, port=args.port)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mridc_tpu", description="TPU-native MRI analysis framework")
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="Train or evaluate a model from a YAML config")
    run_p.add_argument("-c", "--config", required=True)
    run_p.add_argument("overrides", nargs="*", help="key=value dotlist overrides")
    run_p.set_defaults(func=_cmd_run)

    models_p = sub.add_parser("models", help="List registered model names")
    models_p.set_defaults(func=_cmd_models)

    sweep_p = sub.add_parser("sweep", help="Multirun over config overrides")
    sweep_p.add_argument("-c", "--config", required=True)
    sweep_p.add_argument("--set", action="append", help="key=v1,v2,... (repeatable)")
    sweep_p.add_argument("--num-slots", type=int, default=1)
    sweep_p.add_argument("--jobs-per-slot", type=int, default=1)
    sweep_p.set_defaults(func=_cmd_sweep)

    app_p = sub.add_parser("app", help="Interactive run-builder GUI (stdlib HTTP, no streamlit needed)")
    app_p.add_argument("--host", default="127.0.0.1")
    app_p.add_argument("--port", type=int, default=8501)
    app_p.set_defaults(func=_cmd_app)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
