"""Interactive run-builder app (TPU-native rebuild of the reference GUI).

The reference ships a Streamlit page (reference: mridc/app/run.py:27-2833)
whose job is: pick task/mode/model, edit every config field with widgets,
export the YAML, and launch ``mridc run`` / tensorboard. This package
provides the same capability as a dependency-free stdlib HTTP app driven by
the project config zoo and the structured schemas instead of hand-written
widget code: ``python -m mridc_tpu.cli app`` then open the printed URL.
"""

from mridc_tpu.app.core import (
    build_config,
    export_config,
    flatten_config,
    launch_run,
    list_models,
    list_tasks,
    load_defaults,
    run_command,
)

__all__ = [
    "build_config",
    "export_config",
    "flatten_config",
    "launch_run",
    "list_models",
    "list_tasks",
    "load_defaults",
    "run_command",
]
