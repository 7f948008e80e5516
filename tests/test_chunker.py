"""Chunker boundary cases (``fetch_embeddings.py:67-104`` semantics;
SURVEY.md §4.1)."""

from qrag_tpu.pipeline.chunker import chunk_text


def test_short_text_single_chunk():
    assert chunk_text("hello", max_tokens=8000) == ["hello"]


def test_exact_limit_single_chunk():
    text = "x" * 400
    assert chunk_text(text, max_tokens=100) == [text]


def test_breaks_at_sentence_end():
    # max_chars = 40; sentence end inside the last-500-chars window
    text = "aaaa. bbbb. cccc. dddd. eeee. ffff. gggg. hhhh."
    chunks = chunk_text(text, max_tokens=10)
    assert all(len(c) <= 40 for c in chunks)
    # each non-final chunk ends at a '.' boundary (then stripped)
    for c in chunks[:-1]:
        assert c.endswith(".")
    assert "".join(c.replace(" ", "") for c in chunks) == text.replace(" ", "")


def test_breaks_at_newline_when_no_period():
    text = ("a" * 35 + "\n") + "b" * 30
    chunks = chunk_text(text, max_tokens=10)  # max_chars=40
    assert chunks[0] == "a" * 35
    assert chunks[1] == "b" * 30


def test_breaks_at_space_when_no_period_or_newline():
    text = "a" * 35 + " " + "b" * 30
    chunks = chunk_text(text, max_tokens=10)
    assert chunks[0] == "a" * 35
    assert chunks[1] == "b" * 30


def test_hard_split_without_any_breakpoint():
    text = "a" * 100
    chunks = chunk_text(text, max_tokens=10)  # max_chars=40
    assert chunks == ["a" * 40, "a" * 40, "a" * 20]


def test_chunks_are_stripped():
    text = "word. " * 20
    chunks = chunk_text(text.strip(), max_tokens=10)
    for c in chunks:
        assert c == c.strip()


def test_reconstruction_covers_all_content():
    import numpy as np

    rng = np.random.RandomState(3)
    words = ["tok%d" % i for i in range(2000)]
    text = " ".join(rng.choice(words, size=5000))
    chunks = chunk_text(text, max_tokens=100)
    assert "".join(c.replace(" ", "") for c in chunks) == text.replace(" ", "")
