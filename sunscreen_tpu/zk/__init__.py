"""ZKP stack: ristretto255 group, merlin transcripts, Bulletproofs R1CS,
ZKP backend IR/JIT (replaces sunscreen_zkp_backend, the
sunscreen_bulletproofs + sunscreen_curve25519 forks; SDLP lives in
`sunscreen_tpu.logproof`)."""
