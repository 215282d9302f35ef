"""Exact modular / RNS / NTT math kernels (replaces SEAL's poly engine and
sunscreen_math's Ring/Barrett layer — reference: sunscreen_math/src/ring/mod.rs,
seal_fhe/SEAL native NTT; see SURVEY.md §2.4)."""
