// Greedy distance-ordered pixel generation order.
//
// Native (C++) equivalent of the reference's Cython extension
// models/lmconv/get_custom_order.pyx:4-124 (compiled .so in the reference):
// starting from the pixel with maximum signed distance to the background,
// repeatedly pop the highest-distance 4-neighbor of the already-ordered set,
// so every new pixel touches a previously generated one.  Exact semantic
// parity with the reference, including:
//   * distances scaled by 10000 (pyx line 26),
//   * start pixel = first row-major argmax (lines 55-56),
//   * heap keyed by (-distance, [r, c]) with Python-list lexicographic
//     tie-breaking, i.e. ascending (r, c) among equal distances (lines 65-81).
//
// Exposed as a C ABI for ctypes; `custom_order_batch` runs a whole batch of
// images in one call (the reference calls the Cython routine per image from
// a Python loop, models/z_buffermodel.py:690-691).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcustom_order.so custom_order.cpp

#include <cstdint>
#include <queue>
#include <tuple>
#include <vector>

namespace {

using Entry = std::tuple<int64_t, int32_t, int32_t>;  // (-dist, r, c)

void order_one(int rows, int cols, const int32_t* distances, int32_t* out) {
  const int n = rows * cols;
  std::vector<int64_t> d(n);
  for (int i = 0; i < n; ++i) d[i] = static_cast<int64_t>(distances[i]) * 10000;

  // first row-major argmax
  int best = 0;
  for (int i = 1; i < n; ++i)
    if (d[i] > d[best]) best = i;
  int r = best / cols;
  int c = best % cols;

  std::vector<uint8_t> used(n, 0);
  used[best] = 1;
  // min-heap on (-dist, r, c)
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;

  int count = 0;
  out[2 * count] = r;
  out[2 * count + 1] = c;
  ++count;

  while (count < n) {
    // push unvisited 4-neighbors of the last appended pixel, in the
    // reference's U, D, L, R probe order (order is irrelevant to the heap
    // but kept for clarity)
    const int nbr[4][2] = {{r - 1, c}, {r + 1, c}, {r, c - 1}, {r, c + 1}};
    for (auto& p : nbr) {
      int nr = p[0], nc = p[1];
      if (nr < 0 || nr >= rows || nc < 0 || nc >= cols) continue;
      int idx = nr * cols + nc;
      if (used[idx]) continue;
      used[idx] = 1;
      heap.emplace(-d[idx], nr, nc);
    }
    Entry top = heap.top();
    heap.pop();
    r = std::get<1>(top);
    c = std::get<2>(top);
    out[2 * count] = r;
    out[2 * count + 1] = c;
    ++count;
  }
}

}  // namespace

extern "C" {

// distances: (batch, rows*cols) int32; out: (batch, rows*cols, 2) int32.
void custom_order_batch(int batch, int rows, int cols, const int32_t* distances,
                        int32_t* out) {
  const int n = rows * cols;
  for (int b = 0; b < batch; ++b) {
    order_one(rows, cols, distances + static_cast<int64_t>(b) * n,
              out + static_cast<int64_t>(b) * n * 2);
  }
}

}  // extern "C"
