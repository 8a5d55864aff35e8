// Native host-side graph kernels (DGL C++ replacement, SURVEY.md §2.8).
//
// TPU training wants static shapes: the sampler emits FIXED-FANOUT padded
// neighbor blocks (pad = repeat-sample with replacement) so every minibatch
// compiles once. Exposed via ctypes from dance_tpu.native.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdance_native.so graph_sampler.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// Fixed-fanout neighbor sampling over CSR.
//   indptr:  (n+1,)  indices: (nnz,)  weights: (nnz,) or nullptr
//   seeds:   (n_seeds,) node ids to sample neighbors for
// Outputs (pre-allocated by caller):
//   out_idx: (n_seeds * fanout,) sampled neighbor ids (pad: resample w/ repl.)
//   out_w:   (n_seeds * fanout,) matching edge weights (1.0 when no weights)
// Nodes with zero in-edges get themselves as neighbors with weight 0.
void csr_neighbor_sample(const int64_t* indptr, const int32_t* indices,
                         const float* weights, const int32_t* seeds,
                         int64_t n_seeds, int64_t fanout, uint64_t seed,
                         int32_t* out_idx, float* out_w) {
  std::mt19937_64 rng(seed);
  for (int64_t i = 0; i < n_seeds; ++i) {
    const int32_t u = seeds[i];
    const int64_t start = indptr[u], end = indptr[u + 1];
    const int64_t deg = end - start;
    int32_t* dst = out_idx + i * fanout;
    float* dw = out_w + i * fanout;
    if (deg == 0) {
      for (int64_t k = 0; k < fanout; ++k) { dst[k] = u; dw[k] = 0.0f; }
      continue;
    }
    if (deg <= fanout) {
      // take all, then pad by uniform resampling
      for (int64_t k = 0; k < deg; ++k) {
        dst[k] = indices[start + k];
        dw[k] = weights ? weights[start + k] : 1.0f;
      }
      std::uniform_int_distribution<int64_t> pick(0, deg - 1);
      for (int64_t k = deg; k < fanout; ++k) {
        const int64_t j = pick(rng);
        dst[k] = indices[start + j];
        dw[k] = weights ? weights[start + j] : 1.0f;
      }
    } else {
      // partial Fisher-Yates without replacement
      std::vector<int64_t> offs(deg);
      for (int64_t k = 0; k < deg; ++k) offs[k] = k;
      for (int64_t k = 0; k < fanout; ++k) {
        std::uniform_int_distribution<int64_t> pick(k, deg - 1);
        std::swap(offs[k], offs[pick(rng)]);
        dst[k] = indices[start + offs[k]];
        dw[k] = weights ? weights[start + offs[k]] : 1.0f;
      }
    }
  }
}

// COO expression matrix -> undirected bipartite CSR (gene nodes first).
// Returns nnz of the output graph; caller allocates out arrays of size
// 2*nnz_in (+ 2*(n_cells+n_genes) when add_self_loops).
//   rows/cols/vals: (nnz_in,) cell-gene nonzero entries
// Outputs: out_indptr (n_total+1,), out_indices, out_weights
int64_t build_bipartite_csr(const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t nnz_in, int64_t n_cells,
                            int64_t n_genes, int add_self_loops,
                            int64_t* out_indptr, int32_t* out_indices,
                            float* out_weights) {
  const int64_t n_total = n_cells + n_genes;
  std::vector<int64_t> deg(n_total, 0);
  for (int64_t e = 0; e < nnz_in; ++e) {
    deg[cols[e]] += 1;                   // gene node <- cell edge
    deg[rows[e] + n_genes] += 1;         // cell node <- gene edge
  }
  if (add_self_loops) {
    for (int64_t v = 0; v < n_total; ++v) deg[v] += 1;
  }
  out_indptr[0] = 0;
  for (int64_t v = 0; v < n_total; ++v) out_indptr[v + 1] = out_indptr[v] + deg[v];
  std::vector<int64_t> cursor(n_total);
  for (int64_t v = 0; v < n_total; ++v) cursor[v] = out_indptr[v];
  for (int64_t e = 0; e < nnz_in; ++e) {
    const int32_t g = cols[e];
    const int32_t c = rows[e] + static_cast<int32_t>(n_genes);
    out_indices[cursor[g]] = c;
    out_weights[cursor[g]++] = vals[e];
    out_indices[cursor[c]] = g;
    out_weights[cursor[c]++] = vals[e];
  }
  if (add_self_loops) {
    for (int64_t v = 0; v < n_total; ++v) {
      out_indices[cursor[v]] = static_cast<int32_t>(v);
      out_weights[cursor[v]++] = 1.0f;
    }
  }
  return out_indptr[n_total];
}

// Node-induced subgraph extraction from CSR (remapped node ids).
// keep: (n_keep,) sorted original node ids. Returns output nnz.
// Caller allocates out_indices/out_weights of size indptr[n] (upper bound).
int64_t csr_subgraph(const int64_t* indptr, const int32_t* indices,
                     const float* weights, int64_t n_nodes, const int32_t* keep,
                     int64_t n_keep, int64_t* out_indptr, int32_t* out_indices,
                     float* out_weights) {
  std::vector<int32_t> remap(n_nodes, -1);
  for (int64_t i = 0; i < n_keep; ++i) remap[keep[i]] = static_cast<int32_t>(i);
  int64_t out_nnz = 0;
  out_indptr[0] = 0;
  for (int64_t i = 0; i < n_keep; ++i) {
    const int32_t u = keep[i];
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      const int32_t m = remap[indices[e]];
      if (m >= 0) {
        out_indices[out_nnz] = m;
        out_weights[out_nnz++] = weights ? weights[e] : 1.0f;
      }
    }
    out_indptr[i + 1] = out_nnz;
  }
  return out_nnz;
}

}  // extern "C"
