"""ZKP: prove knowledge of a valid sudoku solution consistent with the
public puzzle, without revealing it (reference: `examples/sudoku_zkp`;
4x4 grid here to keep the constraint system small)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types.zkp_types import (Constant, Field,  # noqa: E402
                                           Private, zkp_program)

SIZE = 4
BOX = 2

PUZZLE = [
    [1, 0, 0, 4],
    [0, 4, 1, 0],
    [0, 1, 4, 0],
    [4, 0, 0, 1],
]
SOLUTION = [
    [1, 2, 3, 4],
    [3, 4, 1, 2],
    [2, 1, 4, 3],
    [4, 3, 2, 1],
]


def _group_constraint(cells):
    """Each group must be a permutation of 1..SIZE: check product of
    (cell - v) == 0 for each v, and sum == SIZE*(SIZE+1)/2."""
    total = None
    for cell in cells:
        total = cell if total is None else total + cell
        acc = None
        for v in range(1, SIZE + 1):
            term = cell - v
            acc = term if acc is None else acc * term
        acc.constrain_zero()
    total.constrain_eq(SIZE * (SIZE + 1) // 2)


@zkp_program()
def sudoku(cells: Private[Field, (SIZE, SIZE)],
           puzzle: Constant[Field, (SIZE, SIZE)]):
    grid = cells
    cells = [c for row in cells for c in row]
    puzzle = [p for row in puzzle for p in row]
    # rows / columns / boxes
    for r in range(SIZE):
        _group_constraint(grid[r])
    for c in range(SIZE):
        _group_constraint([grid[r][c] for r in range(SIZE)])
    for br in range(0, SIZE, BOX):
        for bc in range(0, SIZE, BOX):
            _group_constraint([grid[br + i][bc + j]
                               for i in range(BOX) for j in range(BOX)])
    # consistency with the public puzzle: p * (cell - p) == 0
    for i in range(SIZE * SIZE):
        (puzzle[i] * (cells[i] - puzzle[i])).constrain_zero()


def main():
    rt = Runtime.new_zkp()
    cells = [v for row in SOLUTION for v in row]
    puzzle = [v for row in PUZZLE for v in row]
    proof = rt.prove(sudoku, cells, constant_inputs=puzzle)
    assert rt.verify(sudoku, proof, constant_inputs=puzzle)
    print("sudoku solution proof verified (solution stays hidden)")
    bad = list(cells)
    bad[1] = 3  # break a row constraint
    try:
        rt.prove(sudoku, bad, constant_inputs=puzzle)
        raise SystemExit("should have failed")
    except Exception:
        print("invalid solution correctly rejected")


if __name__ == "__main__":
    main()
