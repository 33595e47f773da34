#!/usr/bin/env python
"""RAG demo: ingest text, retrieve with citations (model-free embeddings)."""
from llama_gguf_tpu.rag import HashEmbedder, KnowledgeBase, SqliteVectorStore

kb = KnowledgeBase(SqliteVectorStore(":memory:"), embedder=HashEmbedder(128))
kb.ingest_text("The TPU v5e has 16 GB of HBM per chip.", source="specs.txt")
kb.ingest_text("GGUF stores quantized tensors in block formats.",
               source="formats.txt")
result = kb.retrieve_and_generate("How much memory does a v5e chip have?")
print(result.answer)
for c in result.citations:
    print(f"  [{c.index}] {c.source} (score {c.score:.3f})")
