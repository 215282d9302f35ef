"""Automated market maker: constant-product swap where the trade amount
stays encrypted (reference: `examples/amm` — the wasm demo app)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Rational  # noqa: E402

# pool reserves are public; the trade is private
POOL_A = 100.0
POOL_B = 1000.0


@fhe_program(scheme="bfv")
def swap_a_for_b(amount_a: Cipher[Rational]):
    """Constant product: out_b = B - k / (A + in_a)."""
    k = POOL_A * POOL_B
    new_a = amount_a + POOL_A
    new_b = k / new_a
    return POOL_B - new_b


def main():
    app = Compiler().fhe_program(swap_a_for_b).compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False)
    trade = 5.0
    ct = rt.encrypt(Rational(trade), pub)
    (out,) = rt.run(app.get_program(swap_a_for_b), [ct], pub)
    got = float(rt.decrypt(out, priv))
    expect = POOL_B - POOL_A * POOL_B / (POOL_A + trade)
    print(f"swap {trade} A -> {got:.6f} B (expect {expect:.6f})")
    assert abs(got - expect) < 1e-6


if __name__ == "__main__":
    main()
