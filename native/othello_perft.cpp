// Native Othello perft oracle.
//
// An independent C++ uint64-bitboard rules engine used by the test suite
// (tests/test_perft.py via ctypes) to cross-validate the JAX engine
// exhaustively: perft(d) counts every distinct sequence of d disk
// placements from the standard opening, with forced passes handled
// between placements (a pass consumes no depth; a position where neither
// side can move is terminal and contributes nothing at depth > 0).
//
// Board convention matches the framework: bit i = row*8 + col (action
// index othello.py uses); standard opening d4/e5 white, d5/e4 black,
// black to move (othello.py:256-271).  The move/flip rules implement the
// same 8-direction ray semantics as othello.py:273-311 via classic
// shift-mask fills — written from the rules, not translated from any
// existing engine.
//
// Build: g++ -O2 -shared -fPIC -o libothello_perft.so othello_perft.cpp

#include <cstdint>

namespace {

constexpr uint64_t kNotColA = 0xFEFEFEFEFEFEFEFEULL;  // clears col 0
constexpr uint64_t kNotColH = 0x7F7F7F7F7F7F7F7FULL;  // clears col 7

inline uint64_t shift_dir(uint64_t b, int dir) {
  switch (dir) {
    case 0: return (b << 8);                // south (row+1)
    case 1: return (b >> 8);                // north
    case 2: return (b << 1) & kNotColA;     // east  (col+1)
    case 3: return (b >> 1) & kNotColH;     // west
    case 4: return (b << 9) & kNotColA;     // south-east
    case 5: return (b << 7) & kNotColH;     // south-west
    case 6: return (b >> 7) & kNotColA;     // north-east
    case 7: return (b >> 9) & kNotColH;     // north-west
  }
  return 0;
}

inline uint64_t legal_moves(uint64_t mine, uint64_t opp) {
  const uint64_t empty = ~(mine | opp);
  uint64_t moves = 0;
  for (int d = 0; d < 8; ++d) {
    uint64_t x = shift_dir(mine, d) & opp;
    for (int i = 0; i < 5; ++i) x |= shift_dir(x, d) & opp;
    moves |= shift_dir(x, d) & empty;
  }
  return moves;
}

inline uint64_t flips_for(uint64_t mine, uint64_t opp, uint64_t move) {
  uint64_t flips = 0;
  for (int d = 0; d < 8; ++d) {
    uint64_t x = shift_dir(move, d) & opp;
    for (int i = 0; i < 5; ++i) x |= shift_dir(x, d) & opp;
    if (shift_dir(x, d) & mine) flips |= x;
  }
  return flips;
}

unsigned long long perft_rec(uint64_t cur, uint64_t opp, int depth) {
  if (depth == 0) return 1ULL;
  uint64_t moves = legal_moves(cur, opp);
  if (!moves) {
    // Forced pass (othello.py:436-442): opponent moves, no depth spent;
    // if neither side can move the game is over -> no sequences left.
    if (!legal_moves(opp, cur)) return 0ULL;
    return perft_rec(opp, cur, depth);
  }
  unsigned long long total = 0;
  while (moves) {
    const uint64_t move = moves & (~moves + 1);   // lowest set bit
    moves ^= move;
    const uint64_t fl = flips_for(cur, opp, move);
    total += perft_rec(opp ^ fl, (cur | fl) | move, depth - 1);
  }
  return total;
}

}  // namespace

extern "C" {

// perft from an arbitrary position (cur = side to move).
unsigned long long othello_perft_from(uint64_t cur, uint64_t opp,
                                      int depth) {
  return perft_rec(cur, opp, depth);
}

// perft from the standard opening, black to move.
unsigned long long othello_perft(int depth) {
  const uint64_t black = (1ULL << 28) | (1ULL << 35);   // e4, d5
  const uint64_t white = (1ULL << 27) | (1ULL << 36);   // d4, e5
  return perft_rec(black, white, depth);
}

// Expose the primitives so tests can cross-check single positions too.
uint64_t othello_legal(uint64_t mine, uint64_t opp) {
  return legal_moves(mine, opp);
}

uint64_t othello_flips(uint64_t mine, uint64_t opp, int square) {
  return flips_for(mine, opp, 1ULL << square);
}

}  // extern "C"
