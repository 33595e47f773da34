"""llama-gguf-tpu: a TPU-native GGUF LLM inference engine in JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of Lexmata/llama-gguf
(/root/reference) for TPU hardware: GGUF loading with all K-quant formats,
fused dequant-matmul Pallas kernels feeding the MXU, a jitted functional
decode step with donated KV buffers, continuous batching, an OpenAI-compatible
server, and mesh-sharded multi-chip execution via jax.sharding.

Layer map (mirrors reference src/lib.rs:27-47, re-architected TPU-first):
  gguf/       GGUF v1-3 reader/writer/re-quantizer         (ref: src/gguf/)
  quant/      block formats, numpy dequant, TPU repacking  (ref: src/tensor/quant/)
  ops/        Pallas kernels + XLA ops (qmatmul, attention, norms, rope)
              (ref: src/backend/)
  models/     architecture registry, config, loader, functional transformer,
              MoE, DeltaNet, Mamba, BERT, KV caches        (ref: src/model/)
  tokenizer/  BPE / SentencePiece / Unigram / WordPiece    (ref: src/tokenizer/)
  sampling/   sampler pipeline + grammar masks             (ref: src/sampling/)
  engine/     generation loop, chat, continuous batching   (ref: src/engine*.rs)
  server/     OpenAI-compatible HTTP server                (ref: src/server/)
  parallel/   mesh/sharding plans over ICI/DCN             (ref: src/distributed/)
  utils/      config system, HF hub client, logging        (ref: src/config.rs etc)
"""

__version__ = "0.1.0"
