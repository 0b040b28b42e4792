// spkernels — native sparse setup kernels for the AMG/ILU setup phase.
//
// The reference delegates its AMG setup (strength -> coarsen -> interp ->
// Galerkin RAP) to HYPRE's native C implementation inside
// HYPRE_BoomerAMGSetup (driven at src/HypreSystem.cpp:692); the TPU rebuild
// keeps setup on the host (cycling runs on device) and uses these kernels
// for the two operations that dominate it:
//
//  * masked A.B^T products (SDDMM): interpolation weights need
//    d_ik = sum_m A[i,m] B[k,m] only at a fixed sparse pattern — computing
//    the full distance-2 product and then restricting it (the scipy
//    formulation) materializes ~nnz * row_width intermediate entries and
//    dominated setup profiles.
//  * CSR SpGEMM (Gustavson, two-pass): A@P and P^T@(AP) for the Galerkin
//    triple product.
//
// Pure C++17, no dependencies; int32 indices/indptr (nnz < 2^31 — matches
// scipy's automatic index width below that bound), float64 values.
// Compiled on demand by tpusolve/native/build.py; NumPy/scipy fallbacks
// remain in the callers.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

using i32 = int32_t;
using i64 = int64_t;

extern "C" {

// out[e] = sum_m A[i,m] * B[k,m]  for each pattern entry e: row i, col k of
// (Pp, Pj).  A is (n x m), B is (nk x m) — rows of A dotted with rows of B.
// Dense stamped accumulator over A's row, then one pass over each B row.
void sk_masked_abt(i32 n, i32 m,
                   const i32* Ap, const i32* Aj, const double* Ax,
                   const i32* Bp, const i32* Bj, const double* Bx,
                   const i32* Pp, const i32* Pj, double* out) {
    std::vector<double> acc(static_cast<size_t>(m), 0.0);
    std::vector<i32> stamp(static_cast<size_t>(m), -1);
    i64 e = 0;
    for (i32 i = 0; i < n; ++i) {
        if (Pp[i] == Pp[i + 1]) continue;
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
            acc[Aj[t]] = Ax[t];
            stamp[Aj[t]] = i;
        }
        for (i32 p = Pp[i]; p < Pp[i + 1]; ++p) {
            const i32 k = Pj[p];
            double s = 0.0;
            for (i32 t = Bp[k]; t < Bp[k + 1]; ++t) {
                const i32 col = Bj[t];
                if (stamp[col] == i) s += acc[col] * Bx[t];
            }
            out[e++] = s;
        }
    }
}

// Symbolic SpGEMM: fills Cp (size n+1) with the row pointer of C = A@B.
// Returns nnz(C).  A: (n x k), B: (k x m).
i64 sk_spgemm_count(i32 n, i32 m,
                    const i32* Ap, const i32* Aj,
                    const i32* Bp, const i32* Bj,
                    i32* Cp) {
    std::vector<i32> stamp(static_cast<size_t>(m), -1);
    i64 nnz = 0;
    Cp[0] = 0;
    for (i32 i = 0; i < n; ++i) {
        i64 row = 0;
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
            const i32 j = Aj[t];
            for (i32 u = Bp[j]; u < Bp[j + 1]; ++u) {
                const i32 col = Bj[u];
                if (stamp[col] != i) {
                    stamp[col] = i;
                    ++row;
                }
            }
        }
        nnz += row;
        Cp[i + 1] = static_cast<i32>(nnz);
    }
    return nnz;
}

// Numeric SpGEMM with precomputed Cp: fills Cj/Cx; each row's columns are
// emitted sorted ascending (downstream code key-sorts rows).
void sk_spgemm(i32 n, i32 m,
               const i32* Ap, const i32* Aj, const double* Ax,
               const i32* Bp, const i32* Bj, const double* Bx,
               const i32* Cp, i32* Cj, double* Cx) {
    std::vector<double> acc(static_cast<size_t>(m), 0.0);
    std::vector<i32> stamp(static_cast<size_t>(m), -1);
    std::vector<i32> cols;
    cols.reserve(256);
    for (i32 i = 0; i < n; ++i) {
        cols.clear();
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
            const i32 j = Aj[t];
            const double a = Ax[t];
            for (i32 u = Bp[j]; u < Bp[j + 1]; ++u) {
                const i32 col = Bj[u];
                if (stamp[col] != i) {
                    stamp[col] = i;
                    acc[col] = a * Bx[u];
                    cols.push_back(col);
                } else {
                    acc[col] += a * Bx[u];
                }
            }
        }
        std::sort(cols.begin(), cols.end());
        i32 w = Cp[i];
        for (const i32 col : cols) {
            Cj[w] = col;
            Cx[w] = acc[col];
            ++w;
        }
    }
}

// out[e] = sum_k X[i,k] * B[k,j]  for each pattern entry e: row i, col j of
// (Pp, Pj) — the A@B form of the sampled product (no transpose needed).
// Per row: stamp the pattern columns with their output slots, then stream
// X's row and each touched B row once.
void sk_masked_ab(i32 n, i32 m,
                  const i32* Xp, const i32* Xj, const double* Xx,
                  const i32* Bp, const i32* Bj, const double* Bx,
                  const i32* Pp, const i32* Pj, double* out) {
    std::vector<i32> slot(static_cast<size_t>(m), 0);
    std::vector<i32> stamp(static_cast<size_t>(m), -1);
    for (i32 i = 0; i < n; ++i) {
        if (Pp[i] == Pp[i + 1]) continue;
        for (i32 e = Pp[i]; e < Pp[i + 1]; ++e) {
            slot[Pj[e]] = e;
            stamp[Pj[e]] = i;
            out[e] = 0.0;
        }
        for (i32 t = Xp[i]; t < Xp[i + 1]; ++t) {
            const i32 k = Xj[t];
            const double xv = Xx[t];
            for (i32 u = Bp[k]; u < Bp[k + 1]; ++u) {
                const i32 col = Bj[u];
                if (stamp[col] == i) out[slot[col]] += xv * Bx[u];
            }
        }
    }
}

// out[e] = B[j, i] for each pattern entry e: row i, col j of (Pp, Pj) —
// a sampled transpose (B's rows are sorted: binary search).
void sk_sampled_at(i32 n,
                   const i32* Bp, const i32* Bj, const double* Bx,
                   const i32* Pp, const i32* Pj, double* out) {
    for (i32 i = 0; i < n; ++i) {
        for (i32 e = Pp[i]; e < Pp[i + 1]; ++e) {
            const i32 j = Pj[e];
            const i32* lo = Bj + Bp[j];
            const i32* hi = Bj + Bp[j + 1];
            const i32* it = std::lower_bound(lo, hi, i);
            out[e] = (it != hi && *it == i) ? Bx[Bp[j] + (it - (Bj + Bp[j]))]
                                            : 0.0;
        }
    }
}

// Classical Ruge-Stueben C/F splitting (first + second pass) — the serial
// algorithm behind the reference's default coarsen_type 6 (Falgout = RS in
// the interior; single-process runs are pure RS).  S is the strength CSR
// (S[i,j] = 1 iff j strongly influences i), St its transpose (St[i,j] = 1
// iff i strongly influences j).  state out: 1 = C, 0 = F.
// Bucket priority queue over lambda = |St_i| with increment on F-neighbor
// creation (textbook RS); second pass enforces the F-F common-C condition.
void sk_rs_coarsen(i32 n,
                   const i32* Sp, const i32* Sj,
                   const i32* Stp, const i32* Stj,
                   i32* state) {
    const i32 UNDECIDED = -1, F = 0, C = 1;
    std::vector<i32> lambda(n);
    i32 lmax = 0;
    for (i32 i = 0; i < n; ++i) {
        lambda[i] = Stp[i + 1] - Stp[i];
        if (lambda[i] > lmax) lmax = lambda[i];
        state[i] = UNDECIDED;
    }
    // bucket queue: head[l] -> doubly-linked list of nodes with lambda l
    const i32 NIL = -1;
    std::vector<i32> head(static_cast<size_t>(lmax) + n + 2, NIL);
    std::vector<i32> nxt(n, NIL), prv(n, NIL);
    auto bucket_remove = [&](i32 i) {
        if (prv[i] != NIL) nxt[prv[i]] = nxt[i];
        else head[lambda[i]] = nxt[i];
        if (nxt[i] != NIL) prv[nxt[i]] = prv[i];
        nxt[i] = prv[i] = NIL;
    };
    auto bucket_push = [&](i32 i) {
        i32 l = lambda[i];
        prv[i] = NIL;
        nxt[i] = head[l];
        if (head[l] != NIL) prv[head[l]] = i;
        head[l] = i;
    };
    for (i32 i = 0; i < n; ++i) {
        if (lambda[i] == 0) state[i] = F;  // influences nothing
        else bucket_push(i);
    }
    i32 top = lmax;
    i64 remaining = 0;
    for (i32 i = 0; i < n; ++i) if (state[i] == UNDECIDED) ++remaining;
    while (remaining > 0) {
        while (top > 0 && head[top] == NIL) --top;
        if (top <= 0) break;
        const i32 i = head[top];
        bucket_remove(i);
        state[i] = C;
        --remaining;
        // undecided points that i strongly influences become F; their
        // other strong influencers gain priority
        for (i32 t = Stp[i]; t < Stp[i + 1]; ++t) {
            const i32 j = Stj[t];
            if (state[j] != UNDECIDED) continue;
            bucket_remove(j);
            state[j] = F;
            --remaining;
            for (i32 u = Sp[j]; u < Sp[j + 1]; ++u) {
                const i32 k = Sj[u];
                if (state[k] != UNDECIDED) continue;
                bucket_remove(k);
                ++lambda[k];
                if (lambda[k] >= static_cast<i32>(head.size()))
                    head.resize(lambda[k] + 16, NIL);
                bucket_push(k);
                if (lambda[k] > top) top = lambda[k];
            }
        }
    }
    for (i32 i = 0; i < n; ++i)
        if (state[i] == UNDECIDED) state[i] = F;

    // second pass: every strong F-F pair must share a common strong C
    std::vector<i32> mark(n, -1);
    for (i32 i = 0; i < n; ++i) {
        if (state[i] != F) continue;
        for (i32 t = Sp[i]; t < Sp[i + 1]; ++t)   // mark C_i
            if (state[Sj[t]] == C) mark[Sj[t]] = i;
        i32 tentative = -1;
        for (i32 t = Sp[i]; t < Sp[i + 1]; ++t) {
            const i32 j = Sj[t];
            if (state[j] != F || j == i) continue;
            bool common = false;
            for (i32 u = Sp[j]; u < Sp[j + 1]; ++u) {
                const i32 k = Sj[u];
                if (state[k] == C && mark[k] == i) { common = true; break; }
            }
            if (!common) {
                if (tentative >= 0) {
                    // second violation: make i itself C instead
                    state[tentative] = F;
                    state[i] = C;
                    tentative = -1;
                    break;
                }
                tentative = j;
                state[j] = C;
                mark[j] = i;   // j now serves as a common C for i
            }
        }
    }
}

// Classical strength-of-connection pattern:
//   S[i,j] = 1  iff  j != i and -a_ij*sign_i >= theta * max_k(-a_ik*sign_i)
// (sign_i flips for negative diagonals).  One pass per row, no nnz-sized
// temporaries; Sj is written sorted (A's column order).  Returns nnz(S).
i64 sk_strength(i64 n, const i32* Ap, const i32* Aj, const double* Ax,
                double theta, i32* Sp, i32* Sj) {
    i64 w = 0;
    Sp[0] = 0;
    for (i64 i = 0; i < n; ++i) {
        double diag = 0.0;
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t)
            if (Aj[t] == i) { diag = Ax[t]; break; }
        const double sign = (diag < 0.0) ? -1.0 : 1.0;
        double row_max = 0.0;
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
            if (Aj[t] == i) continue;
            const double v = -Ax[t] * sign;
            if (v > row_max) row_max = v;
        }
        const double thresh = theta * row_max;
        if (row_max > 0.0) {
            for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
                if (Aj[t] == i) continue;
                const double v = -Ax[t] * sign;
                if (v >= thresh && v > 0.0) Sj[w++] = Aj[t];
            }
        }
        Sp[i + 1] = static_cast<i32>(w);
    }
    return w;
}

// mask[e] = 1 iff A's entry e's (row, col) is present in S's pattern
// (both CSRs row-sorted with sorted columns; two-pointer row merge).
void sk_pattern_mask(i64 n, const i32* Ap, const i32* Aj,
                     const i32* Sp, const i32* Sj, uint8_t* mask) {
    for (i64 i = 0; i < n; ++i) {
        i32 u = Sp[i];
        const i32 uend = Sp[i + 1];
        for (i32 t = Ap[i]; t < Ap[i + 1]; ++t) {
            const i32 c = Aj[t];
            while (u < uend && Sj[u] < c) ++u;
            mask[t] = (u < uend && Sj[u] == c) ? 1 : 0;
        }
    }
}

// Row-major CSR extraction from a dense (rows x ndiag) float32 DIA-value
// table (column j holds diagonal offs[j]) — the stencil generator's
// with_host path.  One pass, no index temporaries: at 450M nnz the numpy
// nonzero detour allocates ~7 GB of int64 scratch, which is minutes of
// first-touch page faults on paravirtual hosts.
// Returns nnz; fills indptr (rows+1, int64), cols (int64), vals (f64).
i64 sk_dia_to_csr(i64 rows, i32 ndiag,
                  const float* dia_t, const i64* offs,
                  i64* indptr, i64* cols, double* vals) {
    i64 w = 0;
    indptr[0] = 0;
    for (i64 r = 0; r < rows; ++r) {
        const float* row = dia_t + r * ndiag;
        for (i32 k = 0; k < ndiag; ++k) {
            if (row[k] != 0.0f) {
                cols[w] = r + offs[k];
                vals[w] = static_cast<double>(row[k]);
                ++w;
            }
        }
        indptr[r + 1] = w;
    }
    return w;
}

}  // extern "C"
