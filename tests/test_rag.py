"""RAG subsystem tests: chunkers, HNSW recall, sqlite store search modes,
metadata filters, knowledge base ingest/retrieve/generate with citations,
incremental sync (parity model: reference tests/rag_integration_test.rs but
against in-memory SQLite instead of Postgres)."""

import numpy as np
import pytest

from llama_gguf_tpu.rag import (
    HNSWIndex,
    HashEmbedder,
    KnowledgeBase,
    MarkdownSplitter,
    ParagraphSplitter,
    RecursiveCharacterSplitter,
    SentenceSplitter,
    SlidingWindowSplitter,
    SqliteVectorStore,
    get_chunker,
)


# -- chunkers -------------------------------------------------------------------

def test_recursive_splitter_respects_size():
    text = "para one.\n\n" + ("word " * 300) + "\n\nlast para."
    s = RecursiveCharacterSplitter(chunk_size=100, chunk_overlap=10)
    chunks = s.split(text)
    assert all(len(c) <= 100 for c in chunks)
    joined = " ".join(chunks)
    assert "para one." in joined and "last para." in joined


def test_recursive_splitter_overlap():
    s = RecursiveCharacterSplitter(chunk_size=50, chunk_overlap=20)
    chunks = s.split("abcdefghij " * 20)
    assert len(chunks) >= 2
    with pytest.raises(ValueError):
        RecursiveCharacterSplitter(chunk_size=10, chunk_overlap=10)


def test_markdown_splitter_headers():
    md = ("# Title\nintro text\n\n## Section A\ncontent a\n\n"
          "## Section B\ncontent b here\n\n```\n# not a header\n```\nafter")
    chunks = MarkdownSplitter(max_chunk_size=200).split(md)
    paths = [c.metadata.get("headers", []) for c in chunks]
    assert ["Title"] in paths
    assert ["Title", "Section A"] in paths
    texts = " ".join(c.text for c in chunks)
    assert "# not a header" in texts  # code fence preserved, not split on


def test_sliding_window():
    s = SlidingWindowSplitter(window_size=20, overlap=5)
    chunks = s.split("the quick brown fox jumps over the lazy dog again")
    assert len(chunks) >= 2
    assert all(len(c) <= 20 for c in chunks)


def test_sentence_and_paragraph():
    text = "One. Two! Three? Four."
    assert SentenceSplitter(max_chunk_size=11).split(text) == [
        "One. Two!", "Three?", "Four."]
    paras = ParagraphSplitter().split("a\n\nb\n\n\nc")
    assert paras == ["a", "b", "c"]


def test_get_chunker_names():
    for name in ("recursive", "markdown", "sliding", "sentence", "paragraph"):
        assert get_chunker(name) is not None
    with pytest.raises(ValueError):
        get_chunker("nope")


# -- HNSW -----------------------------------------------------------------------

def test_hnsw_recall_vs_bruteforce():
    rng = np.random.default_rng(0)
    dim, n = 32, 500
    data = rng.normal(size=(n, dim)).astype(np.float32)
    idx = HNSWIndex(dim, m=8, ef_construction=64)
    for i in range(n):
        idx.add(i, data[i])
    norm = data / np.linalg.norm(data, axis=1, keepdims=True)
    hits = 0
    trials = 20
    for q in range(trials):
        query = rng.normal(size=dim).astype(np.float32)
        qn = query / np.linalg.norm(query)
        true_top = set(np.argsort(-(norm @ qn))[:10].tolist())
        got = {i for i, _ in idx.search(query, 10, ef=80)}
        hits += len(true_top & got)
    recall = hits / (10 * trials)
    assert recall >= 0.9, recall


def test_hnsw_serialization_roundtrip():
    rng = np.random.default_rng(1)
    idx = HNSWIndex(16, m=4)
    for i in range(100):
        idx.add(f"id{i}", rng.normal(size=16).astype(np.float32))
    blob = idx.to_bytes()
    idx2 = HNSWIndex.from_bytes(blob)
    q = rng.normal(size=16).astype(np.float32)
    assert [i for i, _ in idx.search(q, 5)] == \
        [i for i, _ in idx2.search(q, 5)]


# -- sqlite store ------------------------------------------------------------------

@pytest.fixture
def store():
    s = SqliteVectorStore(":memory:")
    emb = HashEmbedder(dim=64)
    docs = {
        "doc1": ("the cat sat on the mat", {"topic": "animals", "year": 2020}),
        "doc2": ("quantum computing uses qubits", {"topic": "physics",
                                                   "year": 2023}),
        "doc3": ("cats and dogs are pets", {"topic": "animals", "year": 2021}),
    }
    for doc_id, (text, meta) in docs.items():
        s.add_document(doc_id, f"{doc_id}.txt",
                       [(text, emb.embed(text), meta)],
                       content_hash=s.content_hash(text))
    return s, emb


def test_semantic_search(store):
    s, emb = store
    hits = s.semantic_search(emb.embed("kitten sitting on a mat"), k=2)
    assert hits and hits[0].doc_id in ("doc1", "doc3")
    assert hits[0].score >= hits[-1].score


def test_keyword_search(store):
    s, _ = store
    hits = s.keyword_search("qubits computing", k=2)
    assert hits and hits[0].doc_id == "doc2"


def test_hybrid_rrf(store):
    s, emb = store
    hits = s.hybrid_search("cat mat", emb.embed("cat mat"), k=3)
    assert hits and hits[0].doc_id in ("doc1", "doc3")


def test_metadata_filters(store):
    s, emb = store
    q = emb.embed("animals")
    hits = s.semantic_search(q, k=3, filters={"topic": "animals"})
    assert hits and all(h.metadata["topic"] == "animals" for h in hits)
    hits = s.semantic_search(q, k=3, filters={"year": {"$gte": 2021}})
    assert hits and all(h.metadata["year"] >= 2021 for h in hits)
    hits = s.semantic_search(q, k=3,
                             filters={"topic": {"$in": ["physics"]}})
    assert hits and all(h.metadata["topic"] == "physics" for h in hits)


def test_delete_document(store):
    s, emb = store
    s.delete_document("doc1")
    assert s.stats()["documents"] == 2
    hits = s.semantic_search(emb.embed("cat on the mat"), k=3)
    assert all(h.doc_id != "doc1" for h in hits)


# -- knowledge base ------------------------------------------------------------------

def test_kb_ingest_retrieve_citations(tmp_path):
    kb = KnowledgeBase(SqliteVectorStore(":memory:"),
                       embedder=HashEmbedder(64), chunk_size=120,
                       chunk_overlap=20)
    n = kb.ingest_text(
        "The eiffel tower is in paris. " * 4 +
        "\n\nMount fuji is the tallest mountain in japan. " * 4,
        source="facts.txt")
    assert n >= 2
    hits = kb.retrieve("tallest mountain in japan", k=2)
    assert hits and "fuji" in hits[0].text.lower()

    result = kb.retrieve_and_generate("where is the eiffel tower", k=2)
    assert result.citations and result.citations[0].index == 1
    assert "eiffel" in result.answer.lower()


def test_kb_incremental_sync(tmp_path):
    kb = KnowledgeBase(SqliteVectorStore(":memory:"),
                       embedder=HashEmbedder(64))
    f = tmp_path / "doc.txt"
    f.write_text("version one of the content")
    assert kb.ingest_path(str(f)) > 0
    assert kb.ingest_path(str(f)) == 0  # unchanged -> skipped
    assert kb.stats.skipped_unchanged == 1
    f.write_text("version two changed content")
    assert kb.ingest_path(str(f)) > 0  # hash changed -> re-ingested
    hits = kb.retrieve("version two changed", k=1, search="keyword")
    assert hits and "version two" in hits[0].text


def test_kb_directory_ingest_and_kinds(tmp_path):
    (tmp_path / "a.md").write_text("# Doc\nmarkdown body text here")
    (tmp_path / "b.py").write_text("def fn():\n    return 42")
    (tmp_path / "c.png").write_bytes(b"\x89PNG fake")
    kb = KnowledgeBase(SqliteVectorStore(":memory:"),
                       embedder=HashEmbedder(64))
    n = kb.ingest_path(str(tmp_path))
    assert n >= 2  # md + py ingested, png skipped
    hits = kb.retrieve("markdown body", k=1, search="keyword")
    assert hits and hits[0].metadata["content_kind"] == "markdown"


def test_pgvector_gated():
    from llama_gguf_tpu.rag.pgvector_store import PgVectorStore

    with pytest.raises(RuntimeError, match="psycopg2"):
        PgVectorStore("postgres://nope")


# -- incremental directory sync (parity: rag/sync.rs) --------------------------

def test_sync_directory_incremental(tmp_path):
    from llama_gguf_tpu.rag.knowledge_base import KnowledgeBase
    from llama_gguf_tpu.rag.sqlite_store import SqliteVectorStore

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text("alpha document about apples")
    (docs / "b.txt").write_text("beta document about bananas")

    kb = KnowledgeBase(SqliteVectorStore(":memory:"))
    r1 = kb.sync_directory(str(docs))
    assert (r1.added, r1.updated, r1.deleted, r1.unchanged) == (2, 0, 0, 0)

    # no changes -> everything unchanged, nothing re-chunked
    r2 = kb.sync_directory(str(docs))
    assert (r2.added, r2.updated, r2.deleted, r2.unchanged) == (0, 0, 0, 2)

    # modify one, add one, delete one
    (docs / "a.txt").write_text("alpha document about apricots now")
    (docs / "c.txt").write_text("gamma document about cherries")
    (docs / "b.txt").unlink()
    r3 = kb.sync_directory(str(docs))
    assert (r3.added, r3.updated, r3.deleted, r3.unchanged) == (1, 1, 1, 0)

    # the deleted document's chunks are gone from retrieval
    hits = kb.retrieve("bananas", k=5, search="keyword")
    assert all("banana" not in h.text for h in hits)
    hits = kb.retrieve("apricots", k=5, search="keyword")
    assert any("apricot" in h.text for h in hits)


def test_document_tracker_state_file(tmp_path):
    from llama_gguf_tpu.rag.sync import DocumentTracker, content_hash

    docs = tmp_path / "src"
    docs.mkdir()
    (docs / "x.md").write_text("hello world")

    state = str(tmp_path / "tracker.json")
    tr = DocumentTracker(state_path=state)
    changes = tr.detect_changes(docs)
    assert [c.kind for c in changes] == ["new"]
    tr.record_indexed(changes[0].uri, content_hash("hello world"), [1, 2])
    tr.save()

    # reload from disk: unchanged is detected across processes
    tr2 = DocumentTracker(state_path=state)
    tr2.load()
    assert len(tr2) == 1
    changes = tr2.detect_changes(docs)
    assert [c.kind for c in changes] == ["unchanged"]

    (docs / "x.md").write_text("hello world changed")
    ch = tr2.detect_changes(docs)
    assert ch[0].kind == "modified" and ch[0].old_chunk_ids == [1, 2]

    (docs / "x.md").unlink()
    ch = tr2.detect_changes(docs)
    assert ch[0].kind == "deleted" and ch[0].old_chunk_ids == [1, 2]
    tr2.record_deleted(ch[0].uri)
    assert len(tr2) == 0


# -- multimodal extraction (parity: rag/multimodal.rs) -------------------------

def test_multimodal_extract_markdown():
    from llama_gguf_tpu.rag.multimodal import ContentExtractor, ContentType

    md = (
        "Intro text here.\n\n"
        "```python\ndef hello():\n    print('world')\n```\n"
        "Some middle prose.\n"
        "| a | b |\n|---|---|\n| 1 | 2 |\n"
        "![diagram](img/d.png)\n"
        "Closing words."
    )
    doc = ContentExtractor().extract_markdown(md, "doc.md")
    kinds = [e.content_type for e in doc.elements]
    assert ContentType.CODE in kinds and ContentType.TABLE in kinds
    assert ContentType.IMAGE in kinds and ContentType.TEXT in kinds

    code = doc.by_type(ContentType.CODE)[0]
    assert "def hello" in code.text
    assert code.metadata["language"] == "python"
    assert code.metadata["line_count"] == 2

    table = doc.by_type(ContentType.TABLE)[0]
    assert table.metadata["rows"] == 2 and table.metadata["cols"] == 2
    assert table.metadata["header"].startswith("| a |")

    img = doc.by_type(ContentType.IMAGE)[0]
    assert img.metadata["alt_text"] == "diagram"
    assert img.metadata["url"] == "img/d.png"
    assert doc.raw_text == md


def test_multimodal_table_formats():
    from llama_gguf_tpu.rag.multimodal import (
        ContentExtractor, ContentType, ExtractionConfig, TableFormat,
    )

    md = "| a | b |\n|---|---|\n| 1 | 2 |"
    csv = ContentExtractor(ExtractionConfig(table_format=TableFormat.CSV))
    doc = csv.extract_markdown(md)
    assert doc.elements[0].text == "a,b\n1,2"
    plain = ContentExtractor(ExtractionConfig(table_format=TableFormat.PLAIN))
    assert plain.extract_markdown(md).elements[0].text == "a b\n1 2"


def test_multimodal_detect_content_type():
    from llama_gguf_tpu.rag.multimodal import ContentExtractor, ContentType

    d = ContentExtractor.detect_content_type
    assert d("plain words") == ContentType.TEXT
    assert d("| a | b |\n| 1 | 2 |") == ContentType.TABLE
    assert d("```\ncode\n```") == ContentType.CODE
    assert d("![x](y.png)") == ContentType.IMAGE
    assert d("words and\n```\ncode\n```") == ContentType.MIXED


def test_chunk_content_type_tagging(tmp_path):
    """Ingested chunks get a content_type metadata tag, filterable at
    retrieval (the multimodal typing applied end-to-end)."""
    from llama_gguf_tpu.rag.knowledge_base import KnowledgeBase
    from llama_gguf_tpu.rag.sqlite_store import SqliteVectorStore

    kb = KnowledgeBase(SqliteVectorStore(":memory:"), chunk_size=64,
                       chunk_overlap=0)
    kb.ingest_text("```\nfrobnicate_the_widget()\n```", source="code.md",
                   doc_id="code.md")
    kb.ingest_text("just ordinary prose about widgets", source="t.txt",
                   doc_id="t.txt")
    hits = kb.retrieve("widget", k=5, search="keyword",
                       filters={"content_type": "code"})
    assert hits and all(h.metadata.get("content_type") == "code"
                        for h in hits)
