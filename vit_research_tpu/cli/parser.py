"""Top-level parser: wires every command arc's ``register`` into one
``vit-research-tpu`` program and dispatches, preserving the CLI's
BrokenPipe and VRT_PROFILE conventions."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    # Platform pin: JAX_PLATFORMS in the environment is ignored when a
    # sitecustomize pre-imports jax (backends init lazily, the env is read
    # at import). VRT_PLATFORM=cpu|tpu routes through jax.config instead —
    # e.g. VRT_TINY=1 VRT_PLATFORM=cpu for smoke runs off-device.
    if os.environ.get("VRT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])
    p = argparse.ArgumentParser(prog="vit-research-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    from vit_research_tpu.cli import (db_cmds, eval_cmds, ingest,
                                      segment_cmds, serve_cmds,
                                      train_cmds)

    ingest.register(sub)
    segment_cmds.register(sub)
    db_cmds.register(sub)
    train_cmds.register(sub)
    eval_cmds.register(sub)
    serve_cmds.register(sub)

    args = p.parse_args(argv)
    try:
        args.fn(args)
    except BrokenPipeError:
        # `cli ... | head` closed our stdout early — exit quietly like
        # any well-behaved unix filter instead of dumping a traceback.
        # Safe to scope this broadly because the daemon socket clients
        # (serve.py) re-raise their pipe errors as plain ConnectionError
        # — a dead daemon can never land here and masquerade as success.
        # Redirect stdout to devnull: the interpreter's exit-time flush
        # (and the finally below) would otherwise raise a SECOND
        # BrokenPipeError after this handler.
        import sys

        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
    finally:
        # VRT_PROFILE=1: per-stage span report (embed.decode/dispatch/
        # readback, store.query, ... — utils/profiling.py).
        from vit_research_tpu.utils.profiling import print_global_report

        try:
            print_global_report()
        except BrokenPipeError:
            # the pipe can also close AFTER the command's own output
            # succeeded — the report has nowhere to go, same quiet exit
            pass
