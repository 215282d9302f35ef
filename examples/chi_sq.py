"""Chi-squared — the reference's headline benchmark program
(`examples/chi_sq/src/main.rs`; timings in `sunscreen_docs/src/fhe/
compiler/performance.md`): given counts n0, n1, n2 compute
  alpha = (4*n0*n2 - n1^2)^2
  b1 = 2*(2n0 + n1)^2
  b2 = (2n0 + n1)*(2n2 + n1)
  b3 = 2*(2n2 + n1)^2
Both the naive and the reference's hand-optimized variant are included
(the optimized one replaces constant multiplies with additions and
reuses subexpressions; XLA CSE makes most of that automatic here).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, PlainModulusConstraint, \
    fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Signed  # noqa: E402


@fhe_program(scheme="bfv")
def chi_sq(n0: Cipher[Signed], n1: Cipher[Signed], n2: Cipher[Signed]):
    a = 4 * n0 * n2 - n1 * n1
    alpha = a * a
    b1 = 2 * n0 + n1
    b1 = 2 * (b1 * b1)
    b2 = (2 * n0 + n1) * (2 * n2 + n1)
    b3 = 2 * n2 + n1
    b3 = 2 * (b3 * b3)
    return alpha, b1, b2, b3


@fhe_program(scheme="bfv")
def chi_sq_optimized(n0: Cipher[Signed], n1: Cipher[Signed],
                     n2: Cipher[Signed]):
    x = n0 + n0 + n1
    y = n2 + n2 + n1
    n0n2 = n0 * n2
    n0n2 = n0n2 + n0n2
    n0n2 = n0n2 + n0n2
    n1sq = n1 * n1
    alpha = n0n2 - n1sq
    alpha = alpha * alpha
    b1 = x * x
    b1 = b1 + b1
    b2 = x * y
    b3 = y * y
    b3 = b3 + b3
    return alpha, b1, b2, b3


def expected(n0, n1, n2):
    a = (4 * n0 * n2 - n1 * n1) ** 2
    return (a, 2 * (2 * n0 + n1) ** 2,
            (2 * n0 + n1) * (2 * n2 + n1), 2 * (2 * n2 + n1) ** 2)


def main():
    n0, n1, n2 = 2, 7, 9
    want = expected(n0, n1, n2)
    for prog_fn in (chi_sq, chi_sq_optimized):
        t_start = time.perf_counter()
        app = (Compiler()
               .fhe_program(prog_fn)
               .plain_modulus_constraint(PlainModulusConstraint.Raw(64))
               .compile())
        t_compile = time.perf_counter()
        rt = Runtime.new_fhe(app.params)
        public_key, private_key = rt.generate_keys(galois=False)
        t_keygen = time.perf_counter()
        args = [rt.encrypt(Signed(v), public_key) for v in (n0, n1, n2)]
        t_encrypt = time.perf_counter()
        outs = rt.run(app.get_program(prog_fn), args, public_key)
        t_run = time.perf_counter()
        got = tuple(rt.decrypt_many(outs, private_key))
        t_dec = time.perf_counter()
        assert got == want, (got, want)
        print(f"{prog_fn.name}: ok {got}  compile={t_compile-t_start:.3f}s"
              f" keygen={t_keygen-t_compile:.3f}s"
              f" encrypt={t_encrypt-t_keygen:.3f}s"
              f" run={t_run-t_encrypt:.3f}s decrypt={t_dec-t_run:.3f}s"
              f" (e2e keygen+enc+run+dec="
              f"{t_dec-t_compile:.3f}s)")


if __name__ == "__main__":
    main()
