"""youku_mplug_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-language framework.

A from-scratch rebuild of the capabilities of X-PLUG/Youku-mPLUG (mPLUG-Video):
video pretraining (caption LM + contrastive), video category prediction,
video-text retrieval (dual-encoder + generative ITM rerank), and video
captioning — designed TPU-first:

- GSPMD sharding over a ``(data, model)`` device mesh instead of Megatron
  tensor parallelism over NCCL.
- Pallas kernels for flash attention (fp32 softmax islands), fused layernorm
  and sharded vocab cross-entropy instead of fused CUDA kernels.
- optax + sharded optimizer state instead of DeepSpeed ZeRO.
- orbax checkpoints (single logical checkpoint; GSPMD owns layout) instead of
  per-TP-rank ``mp_rank_XX`` files.

See SURVEY.md at the repo root for the reference analysis this build follows.
"""

__version__ = "0.1.0"
