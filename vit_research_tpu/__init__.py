"""TPU-native framework with the capabilities of Gurinder-Vasanta/vit-research.

A from-scratch JAX/XLA/Pallas/pjit re-design of the reference NBA-video ViT
research pipeline (see /root/repo/SURVEY.md for the blueprint):

- ``models``    : Flax ViT backbone (both the random-init p32@432x768 space and
                  the pretrained-import p16@224 space), ChunkEncoder, RAG/RATT
                  heads, poolers, projection heads, temporal head.
- ``ops``       : Pallas TPU kernels (flash attention, fused patch-embed,
                  Viterbi max-plus scan, masked top-k retrieval) with XLA
                  fallbacks.
- ``parallel``  : device meshes, sharding rules, pjit embedding engine and
                  data-parallel train steps (psum over ICI).
- ``store``     : host-persistent vector store with a Chroma-compatible API and
                  a device-side exact top-k query path.
- ``data``      : frame preprocessing, label parsing, sample/chunk building,
                  memmap frame-embedding store, host input pipeline.
- ``segment``   : kNN vote classifiers + HMM Viterbi smoothing + clip
                  extraction / finalize / merge.
- ``retrieval`` : frame/chunk retrievers and the cached-retrieval builders
                  (label-conditioned bins; stage-2 sim/contrast/temporal).
- ``train``     : loss zoo, optax schedules/accumulation, training loops for
                  every stage of the reference, Orbax checkpointing.
- ``evaluate``  : per-clip logit-sequence inference and event localization.
"""

__version__ = "0.1.0"
