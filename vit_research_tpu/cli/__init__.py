"""Command-line entry points wiring the pipeline stages together.

The reference runs as a constellation of scripts (``python -m
train.training``, per-stage writers, eval programs). This CLI exposes the
same operations as subcommands of one program — see ``python -m
vit_research_tpu.cli --help`` and the per-arc modules:

- :mod:`.ingest` — extract-frames, write-frame-db, write-embeddings,
  build-frame-store
- :mod:`.segment_cmds` — segment (offline/--follow/--socket),
  tune-segment, self-label, finalize-clips, merge-clips, clustering,
  fresh-test
- :mod:`.db_cmds` — write-ratt-db, write-rag-db, rebuild-db, search,
  db-info
- :mod:`.train_cmds` — train-stage1, train-rag, train-cached,
  train-stage2
- :mod:`.eval_cmds` — smoke, metrics, eval-clips, score-events
- :mod:`.serve_cmds` — serve, serve-ctl
- :mod:`.common` — shared helpers (monkeypatch target for tests)
"""

from vit_research_tpu.cli import common  # noqa: F401  (cli.common.<helper> patch point)
from vit_research_tpu.cli.common import (  # noqa: F401  back-compat re-exports
    _engine,
    _stage1_encode_batch,
)
from vit_research_tpu.cli.parser import main  # noqa: F401
from vit_research_tpu.cli.segment_cmds import (  # noqa: F401
    _DaemonFollowBackend,
    _LocalFollowBackend,
)
