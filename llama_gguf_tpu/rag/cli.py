"""RAG subcommand dispatch (wired from the main CLI)."""

from __future__ import annotations


def run_rag_command(args) -> int:
    from ..config import Config
    from .knowledge_base import KnowledgeBase
    from .sqlite_store import SqliteVectorStore

    cfg = Config.load(getattr(args, "config", None)).rag
    store = SqliteVectorStore(args.db or cfg.db)
    kb = KnowledgeBase(store, embed_model_path=args.model or cfg.embed_model,
                       chunker=cfg.chunker, chunk_size=cfg.chunk_size,
                       chunk_overlap=cfg.chunk_overlap)
    if args.rag_command == "ingest":
        total = 0
        for path in args.paths:
            n = kb.ingest_path(path, chunker=args.chunker)
            print(f"{path}: {n} chunks")
            total += n
        print(f"ingested {total} chunks into {args.db}")
        return 0
    if args.rag_command == "search":
        for hit in kb.retrieve(args.query, k=args.k):
            print(f"[{hit.score:.3f}] {hit.source}: {hit.text[:100]!r}")
        return 0
    if args.rag_command == "ask":
        result = kb.retrieve_and_generate(args.query, k=args.k)
        print(result.answer)
        for c in result.citations:
            print(f"  [{c.index}] {c.source}")
        return 0
    return 2
