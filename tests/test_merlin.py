"""Merlin transcript conformance: pinned byte-for-byte against the
canonical Rust `merlin` crate test vector (tests/transcript.rs,
`test_transcript_equivalence_simple`) plus STROBE-level behaviors the
proof systems rely on. The reference consumes merlin transcripts in
`logproof/src/transcript.rs` and the bulletproofs fork."""

import jax  # noqa: F401  (conftest forces cpu before jax arrays exist)

from sunscreen_tpu.zk.merlin import Transcript

# The canonical merlin equivalence vector: new(b"test protocol"),
# append_message(b"some label", b"some data"), 32 challenge bytes with
# label b"challenge".
MERLIN_SIMPLE_VECTOR = (
    "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615")


def test_merlin_equivalence_simple():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert t.challenge_bytes(b"challenge", 32).hex() == \
        MERLIN_SIMPLE_VECTOR


def test_merlin_equivalence_complex():
    """Mirrors merlin's `test_transcript_equivalence_complex` structure:
    interleaved appends and challenges must be order-sensitive and
    deterministic."""
    t = Transcript(b"test protocol")
    t.append_message(b"step1", b"some data")
    data = bytes([99] * 1024)
    chl_bytes = b""
    for _ in range(32):
        chl_bytes = t.challenge_bytes(b"challenge", 32)
        t.append_message(b"bigdata", data)
        t.append_message(b"challengedata", chl_bytes)
    # the final challenge must be reproducible run-to-run
    t2 = Transcript(b"test protocol")
    t2.append_message(b"step1", b"some data")
    chl2 = b""
    for _ in range(32):
        chl2 = t2.challenge_bytes(b"challenge", 32)
        t2.append_message(b"bigdata", data)
        t2.append_message(b"challengedata", chl2)
    assert chl_bytes == chl2
    assert t.challenge_bytes(b"final", 32) == t2.challenge_bytes(
        b"final", 32)


def test_transcripts_diverge_on_different_input():
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_message(b"l", b"x")
    b.append_message(b"l", b"y")
    assert a.challenge_bytes(b"c", 32) != b.challenge_bytes(b"c", 32)


def test_scalar_challenge_in_field():
    from sunscreen_tpu.zk import curve25519 as cv
    t = Transcript(b"proto")
    t.append_message(b"l", b"x")
    for label in (b"a", b"b", b"c"):
        s = t.challenge_scalar(label)
        assert 0 <= s < cv.L
