// heatx native runtime components.
//
// The reference implements its whole host runtime in Rust; heatx keeps the
// TPU compute path in JAX/XLA and implements the host-side hot paths —
// data loading (EPW / EnergyPlus CSV parsing) and the building "compiler"
// inner loops (stability-search discretization, chunk labelling) — natively
// here.  Exposed via a C ABI consumed through ctypes (no pybind11 in the
// image); every entry point has a pure-Python fallback.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV parsing (EnergyPlus eplusout.csv, EPW weather records)
// ---------------------------------------------------------------------------

// Count data rows (lines after `skip_header` with at least one comma).
// Returns -2 when a line exceeds the read buffer (a very wide EnergyPlus
// CSV): the caller must fall back to the Python parser — continuing would
// silently split the line into misaligned pseudo-rows.
long hx_count_rows(const char* path, int skip_header) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long rows = 0;
  int line = 0;
  char buf[1 << 16];
  while (std::fgets(buf, sizeof buf, f)) {
    if (!std::strchr(buf, '\n') && !std::feof(f)) {
      std::fclose(f);
      return -2;  // overlong line (buffer holds a partial record)
    }
    if (line++ < skip_header) continue;
    if (std::strchr(buf, ',')) rows++;
  }
  std::fclose(f);
  return rows;
}

// Parse selected columns of a CSV into `out` (row-major [rows, n_usecols]).
// Non-numeric fields parse as NaN.  Returns rows parsed, or -1 on error.
long hx_parse_csv(const char* path, int skip_header, const int* usecols,
                  int n_usecols, double* out, long max_rows) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int max_col = 0;
  for (int i = 0; i < n_usecols; i++)
    if (usecols[i] > max_col) max_col = usecols[i];

  std::vector<double> fields(max_col + 1);
  char buf[1 << 16];
  long row = 0;
  int line = 0;
  while (std::fgets(buf, sizeof buf, f) && row < max_rows) {
    if (!std::strchr(buf, '\n') && !std::feof(f)) {
      std::fclose(f);
      return -2;  // overlong line (see hx_count_rows)
    }
    if (line++ < skip_header) continue;
    if (!std::strchr(buf, ',')) continue;
    // split in place
    int col = 0;
    char* p = buf;
    while (col <= max_col) {
      char* comma = std::strchr(p, ',');
      if (comma) *comma = '\0';
      char* end = nullptr;
      double v = std::strtod(p, &end);
      fields[col] = (end == p) ? NAN : v;
      col++;
      if (!comma) break;
      p = comma + 1;
    }
    for (; col <= max_col; col++) fields[col] = NAN;
    for (int i = 0; i < n_usecols; i++) out[row * n_usecols + i] = fields[usecols[i]];
    row++;
  }
  std::fclose(f);
  return row;
}

// ---------------------------------------------------------------------------
// Discretization stability search (discretization.rs:410-544)
// ---------------------------------------------------------------------------

// One construction: layers [k, rho, cp, thickness] with is_gas flags.
// Returns the timestep subdivision; fills n_elements.  Mirrors the
// reference's recursive search iteratively.
int hx_discretize_one(const double* k, const double* rho, const double* cp,
                      const double* thickness, const uint8_t* is_gas,
                      int n_layers, double model_dt, double max_dx,
                      double min_dt, double max_rs, int* n_elements) {
  int n = 1;
  for (;;) {
    double dt = model_dt / n;
    bool retry = false;
    for (int li = 0; li < n_layers; li++) {
      if (is_gas[li]) {
        n_elements[li] = 0;
        continue;
      }
      double rc = rho[li] * cp[li];
      double b = -dt / (rc * max_rs);
      double c = -2.0 * dt * k[li] / rc;
      double disc = b * b - 4.0 * c;
      double min_dx = (-b + std::sqrt(disc)) / 2.0;
      if (min_dx > thickness[li]) {
        if (model_dt / (n + 1) > min_dt) {
          retry = true;
          break;
        }
        n_elements[li] = 0;
      } else {
        double m = std::floor(thickness[li] / min_dx);
        double dx = thickness[li] / m;
        if (dx > max_dx) {
          if (model_dt / (n + 1) > min_dt) {
            retry = true;
            break;
          }
          n_elements[li] = 0;
        } else {
          n_elements[li] = (int)m;
        }
      }
    }
    if (!retry) return n;
    n++;
  }
}

// Batch version: `offsets[c]..offsets[c+1]` are the layer range of
// construction c in the flat layer arrays.  Fills tsubs[c] and n_elements.
void hx_discretize_batch(const double* k, const double* rho, const double* cp,
                         const double* thickness, const uint8_t* is_gas,
                         const long* offsets, int n_constructions,
                         double model_dt, double max_dx, double min_dt,
                         double max_rs, int* tsubs, int* n_elements) {
  for (int c = 0; c < n_constructions; c++) {
    long o = offsets[c];
    int nl = (int)(offsets[c + 1] - o);
    tsubs[c] = hx_discretize_one(k + o, rho + o, cp + o, thickness + o,
                                 is_gas + o, nl, model_dt, max_dx, min_dt,
                                 max_rs, n_elements + o);
  }
}

// ---------------------------------------------------------------------------
// No-mass chunk labelling (mask form of discretization.rs get_chunks)
// ---------------------------------------------------------------------------

// chunk_id[s*N+i] = index of the no-mass run containing node i (-1 for
// massive/invalid); chunk_count[s*C+c] = nodes in run c.  Returns the max
// number of runs over all surfaces.
int hx_chunk_ids(const uint8_t* nomass, const int* n_nodes, long S, int N,
                 int C, int* chunk_id, double* chunk_count) {
  int max_runs = 0;
  for (long s = 0; s < S; s++) {
    int cid = -1;
    bool prev = false;
    for (int i = 0; i < N; i++) chunk_id[s * N + i] = -1;
    for (int c = 0; c < C; c++) chunk_count[s * C + c] = 0.0;
    for (int i = 0; i < n_nodes[s]; i++) {
      bool nm = nomass[s * N + i] != 0;
      if (nm) {
        if (!prev) cid++;
        if (cid < C) {
          chunk_id[s * N + i] = cid;
          chunk_count[s * C + cid] += 1.0;
        }
      }
      prev = nm;
    }
    if (cid + 1 > max_runs) max_runs = cid + 1;
  }
  return max_runs;
}

}  // extern "C"
