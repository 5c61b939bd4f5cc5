// qrec_native: host-side hot paths in C++ (ctypes ABI).
//
// The reference framework leans on native code through its dependencies
// (TF1 kernels, numba, gensim's C word2vec — SURVEY §2.0). Our TPU compute
// path is XLA; this library covers the two genuinely host-bound paths:
//
//  1. rating-file parsing — replaces the Python regex loop
//     (qrec_tpu/io.py load_ratings) for multi-million-line datasets;
//  2. weighted random-walk generation — replaces the numpy step loop
//     (qrec_tpu/ops/walks.py random_walks) whose pointer-chasing does not
//     vectorize well.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libqrec_native.so qrec_native.cpp
// Loaded via ctypes (qrec_tpu/native.py) with a pure-Python fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Rating-file parser
// ---------------------------------------------------------------------------
// Tokenizes on [' ', ',', '\t'] (the reference's delimiter class,
// util/io.py:46), selects columns u/i/r, optionally binarizes with a
// threshold (drop below, rating := 1 otherwise), and maps user/item tokens
// to dense first-appearance ids.
//
// Result layout is returned through an opaque handle; the Python side copies
// the arrays out and frees the handle.

struct ParseResult {
  std::vector<int32_t> users;
  std::vector<int32_t> items;
  std::vector<float> ratings;
  std::string user_names;  // '\n'-joined, first-appearance order
  std::string item_names;
  int64_t n_users = 0;
  int64_t n_items = 0;
};

static inline bool is_delim(char c) {
  return c == ' ' || c == ',' || c == '\t';
}

void* qrec_parse_ratings(const char* path, int u_col, int i_col, int r_col,
                         int binarize, float threshold, int skip_header) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  buf[size] = '\0';

  auto* res = new ParseResult();
  std::unordered_map<std::string, int32_t> user_map, item_map;
  user_map.reserve(1 << 16);
  item_map.reserve(1 << 16);

  const char* p = buf.data();
  const char* end = buf.data() + size;
  int max_col = u_col > i_col ? u_col : i_col;
  if (r_col > max_col) max_col = r_col;
  std::vector<std::pair<const char*, int>> tokens;
  tokens.reserve(8);
  bool first_line = true;

  while (p < end) {
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    if (first_line && skip_header) {
      first_line = false;
      p = line_end + 1;
      continue;
    }
    first_line = false;
    // tokenize
    tokens.clear();
    const char* t = p;
    while (t < line_end) {
      while (t < line_end && is_delim(*t)) t++;
      const char* s = t;
      while (t < line_end && !is_delim(*t) && *t != '\r') t++;
      if (t > s) tokens.push_back({s, (int)(t - s)});
    }
    if ((int)tokens.size() > max_col) {
      float rating = 1.0f;
      if (r_col >= 0) {
        rating = strtof(std::string(tokens[r_col].first,
                                    tokens[r_col].second).c_str(), nullptr);
      }
      bool keep = true;
      if (binarize) {
        if (rating < threshold) keep = false;
        else rating = 1.0f;
      }
      if (keep) {
        std::string u(tokens[u_col].first, tokens[u_col].second);
        std::string i(tokens[i_col].first, tokens[i_col].second);
        auto ui = user_map.find(u);
        int32_t uid;
        if (ui == user_map.end()) {
          uid = (int32_t)user_map.size();
          user_map.emplace(u, uid);
          res->user_names += u;
          res->user_names += '\n';
        } else {
          uid = ui->second;
        }
        auto it = item_map.find(i);
        int32_t iid;
        if (it == item_map.end()) {
          iid = (int32_t)item_map.size();
          item_map.emplace(i, iid);
          res->item_names += i;
          res->item_names += '\n';
        } else {
          iid = it->second;
        }
        res->users.push_back(uid);
        res->items.push_back(iid);
        res->ratings.push_back(rating);
      }
    }
    p = line_end + 1;
  }
  res->n_users = (int64_t)user_map.size();
  res->n_items = (int64_t)item_map.size();
  return res;
}

int64_t qrec_parse_count(void* handle) {
  return ((ParseResult*)handle)->users.size();
}
int64_t qrec_parse_num_users(void* handle) {
  return ((ParseResult*)handle)->n_users;
}
int64_t qrec_parse_num_items(void* handle) {
  return ((ParseResult*)handle)->n_items;
}
int64_t qrec_parse_user_names_len(void* handle) {
  return ((ParseResult*)handle)->user_names.size();
}
int64_t qrec_parse_item_names_len(void* handle) {
  return ((ParseResult*)handle)->item_names.size();
}
void qrec_parse_copy(void* handle, int32_t* users, int32_t* items,
                     float* ratings, char* user_names, char* item_names) {
  auto* res = (ParseResult*)handle;
  memcpy(users, res->users.data(), res->users.size() * sizeof(int32_t));
  memcpy(items, res->items.data(), res->items.size() * sizeof(int32_t));
  memcpy(ratings, res->ratings.data(), res->ratings.size() * sizeof(float));
  memcpy(user_names, res->user_names.data(), res->user_names.size());
  memcpy(item_names, res->item_names.data(), res->item_names.size());
}
void qrec_parse_free(void* handle) { delete (ParseResult*)handle; }

// ---------------------------------------------------------------------------
// Weighted random walks over a CSR graph
// ---------------------------------------------------------------------------
// xorshift128+ PRNG — fast, reproducible from a seed.
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ull + 1;
    s1 = (seed ^ 0xDEADBEEFCAFEBABEull) | 1;
    for (int k = 0; k < 8; k++) next();
  }
  inline uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  inline double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// walks: out buffer (n_starts * walk_length). cum_weights: GLOBAL cumulative
// sum over the CSR data array (double precision); the weighted choice is a
// binary search within [indptr[cur], indptr[cur+1]).
void qrec_random_walks(const int32_t* indptr, const int32_t* indices,
                       const double* cum_weights, int64_t n_nodes,
                       const int32_t* starts, int64_t n_starts,
                       int32_t walk_length, uint64_t seed, int32_t* walks) {
  (void)n_nodes;
  Rng rng(seed);
  for (int64_t w = 0; w < n_starts; w++) {
    int32_t cur = starts[w];
    walks[w * walk_length] = cur;
    for (int32_t step = 1; step < walk_length; step++) {
      int32_t lo = indptr[cur], hi = indptr[cur + 1];
      if (hi <= lo) {  // dead end: stay (caller filters)
        walks[w * walk_length + step] = cur;
        continue;
      }
      double base = lo > 0 ? cum_weights[lo - 1] : 0.0;
      double total = cum_weights[hi - 1] - base;
      double target = base + rng.uniform() * total;
      // binary search first cum > target within [lo, hi)
      int32_t a = lo, b = hi - 1;
      while (a < b) {
        int32_t mid = (a + b) >> 1;
        if (cum_weights[mid] <= target) a = mid + 1;
        else b = mid;
      }
      cur = indices[a];
      walks[w * walk_length + step] = cur;
    }
  }
}

}  // extern "C"
