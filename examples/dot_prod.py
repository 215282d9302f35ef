"""Batched SIMD dot product with rotations (reference:
`examples/dot_prod` — N-lane Batched vectors, log-rotation sum)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Batched, Cipher  # noqa: E402


@fhe_program(scheme="bfv")
def dot_prod(a: Cipher[Batched], b: Cipher[Batched]):
    prod = a * b
    # log-step rotation sum across each row
    acc = prod
    steps = 1
    # 8 lanes of interest -> 3 rotation-adds
    for _ in range(3):
        acc = acc + (acc << steps)
        steps *= 2
    return acc


def main():
    app = Compiler().fhe_program(dot_prod).compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys()
    n = app.params.poly_degree
    a = np.zeros(n, dtype=np.int64)
    b = np.zeros(n, dtype=np.int64)
    a[:8] = [1, 2, 3, 4, 5, 6, 7, 8]
    b[:8] = [8, 7, 6, 5, 4, 3, 2, 1]
    ca = rt.encrypt(Batched(a), pub)
    cb = rt.encrypt(Batched(b), pub)
    (out,) = rt.run(app.get_program(dot_prod), [ca, cb], pub)
    got = rt.decrypt(out, priv)
    expect = int(np.dot(a[:8], b[:8]))
    print(f"dot([1..8],[8..1]) = {got[0]} (expect {expect})")
    assert got[0] == expect


if __name__ == "__main__":
    main()
