"""Pallas TPU kernels and jittable compute ops (with XLA fallbacks).

Import submodules explicitly, e.g.::

    from vit_research_tpu.ops import viterbi
    path, score = viterbi.viterbi(log_emit, log_trans, log_prior)
"""

from vit_research_tpu.ops import viterbi  # noqa: F401
