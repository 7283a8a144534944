"""Rename config keys inside a trained run directory — the TPU-native
equivalent of the reference's experiment-workflow utility
(/root/reference/projects/unselfsupervised/edit_trainedmodel_files.py): it
rewrites a renamed hyperparameter (default ``eval_loss_fn`` ->
``val_loss_fn``) in every artifact of a finished run so old runs load under
the current config schema.

Artifacts handled (this framework's run layout, train/exp_manager.py):
  - per-rank log files        mridc_log_globalrank-*_localrank-*.txt
  - the saved run config      config.yaml / hparams.yaml
  - ``.mridc`` archives       (config.yaml inside the tar; weights untouched —
                               orbax/msgpack param names never embed loss keys)

Usage:
    python projects/unselfsupervised/edit_trainedmodel_files.py <run_dir> \
        [old_key] [new_key]
"""

from __future__ import annotations

import argparse
import io
import pathlib
import tarfile
import tempfile


def replace_in_text_file(path: pathlib.Path, old: str, new: str) -> bool:
    text = path.read_text()
    if old not in text:
        return False
    path.write_text(text.replace(old, new))
    return True


def replace_in_archive(path: pathlib.Path, old: str, new: str) -> bool:
    """Rewrite config entries inside a .mridc tar.gz archive in place.
    Non-regular members (directories, links) pass through untouched, member
    metadata is preserved, and a failed rewrite leaves no temp file behind."""
    changed = False
    members = []  # (TarInfo, bytes | None)
    with tarfile.open(path, "r:gz") as tar:
        for m in tar.getmembers():
            handle = tar.extractfile(m) if m.isfile() else None
            data = handle.read() if handle is not None else None
            if data is not None and m.name.endswith((".yaml", ".yml", ".json")) and old.encode() in data:
                data = data.replace(old.encode(), new.encode())
                m.size = len(data)
                changed = True
            members.append((m, data))
    if not changed:
        return False
    tmp = tempfile.NamedTemporaryFile(dir=path.parent, delete=False)
    try:
        with tarfile.open(fileobj=tmp, mode="w:gz") as tar:
            for info, data in members:
                tar.addfile(info, io.BytesIO(data) if data is not None else None)
        tmp.close()
        pathlib.Path(tmp.name).replace(path)
    except BaseException:
        tmp.close()
        pathlib.Path(tmp.name).unlink(missing_ok=True)
        raise
    return True


def edit_run_dir(run_dir: pathlib.Path, old: str, new: str, verbose: bool = True) -> int:
    """Apply the key rename across every artifact under ``run_dir`` (and, like
    the reference, sibling checkpoints one directory up). Returns the number
    of files changed."""
    run_dir = pathlib.Path(run_dir)
    if not run_dir.is_dir():
        raise FileNotFoundError(f"{run_dir} is not a directory")
    changed = 0
    candidates = list(run_dir.rglob("*"))
    candidates += [p for p in run_dir.parent.iterdir() if p.suffix == ".mridc"]
    for p in candidates:
        if not p.is_file():
            continue
        try:
            if p.suffix in (".yaml", ".yml", ".json", ".txt", ".log"):
                hit = replace_in_text_file(p, old, new)
            elif p.suffix == ".mridc":
                hit = replace_in_archive(p, old, new)
            else:
                continue
        except (OSError, UnicodeDecodeError, tarfile.TarError) as exc:
            if verbose:
                print(f"skip {p}: {exc}")
            continue
        if hit:
            changed += 1
            if verbose:
                print(f"edited {p}")
    return changed


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("trained_model_path", type=pathlib.Path, help="Path to the trained run directory.")
    parser.add_argument("old_key", nargs="?", default="eval_loss_fn", help="Key to replace.")
    parser.add_argument("new_key", nargs="?", default="val_loss_fn", help="Replacement key.")
    args = parser.parse_args(argv)
    n = edit_run_dir(args.trained_model_path, args.old_key, args.new_key)
    print(f"Replaced {args.old_key!r} with {args.new_key!r} in {n} file(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
