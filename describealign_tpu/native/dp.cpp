// Native host dynamic programs for describealign-tpu.
//
// The TPU handles all dense math; these two irregular, data-dependent DPs
// run on the host and must keep up with device throughput:
//
// 1. weighted_lis: maximal-weight monotone chain over match candidates
//    (semantics of reference describealign.py:654-699, SortedList variant).
// 2. refine_dp: pass-2 cluster-switch DP over per-frame candidate points
//    (semantics of reference describealign.py:946-983).
//
// Both use ordered std::map/std::multimap keyed by video position; every
// candidate inserts once and is erased at most once => O(n log n).

#include <cstdint>
#include <cmath>
#include <limits>
#include <map>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// weighted LIS
// --------------------------------------------------------------------------
// Inputs sorted by (audio, video, qual). Outputs the chain in increasing
// order as (video, audio) pairs. Returns 0 on success.
int weighted_lis(const int64_t* video_idx, const int64_t* audio_idx,
                 const double* qual, int64_t n,
                 int64_t* out_video, int64_t* out_audio, int64_t* out_len) {
  struct Node { int64_t v, a; int64_t prev; };
  std::vector<Node> nodes;
  nodes.reserve(static_cast<size_t>(n) + 1);
  nodes.push_back({-1, -1, -1});  // sentinel

  struct Entry { double cum; int64_t node; };
  // key: video index; equal keys keep insertion order (multimap guarantees
  // insertion order among equivalent keys since C++11)
  std::multimap<int64_t, Entry> best;
  best.insert({-1, {0.0, 0}});

  for (int64_t t = 0; t < n; ++t) {
    const int64_t v = video_idx[t];
    const int64_t a = audio_idx[t];
    auto it = best.upper_bound(v);  // first entry with key > v
    auto prev = std::prev(it);     // last entry with key <= v (sentinel safe)
    const double cum = prev->second.cum + qual[t];
    const int64_t prev_node = prev->second.node;
    while (it != best.end() && it->second.cum <= cum) {
      it = best.erase(it);
    }
    nodes.push_back({v, a, prev_node});
    best.insert(it, {v, {cum, static_cast<int64_t>(nodes.size()) - 1}});
    // note: 'it' is a valid hint at-or-after the insertion point; multimap
    // inserts as close to the hint as ordering allows (after equal keys)
  }

  // walk back from the overall best (last entry has the max cum by invariant)
  int64_t cur = best.rbegin()->second.node;
  int64_t m = 0;
  while (cur != 0) {  // stop at sentinel
    out_video[m] = nodes[cur].v;
    out_audio[m] = nodes[cur].a;
    ++m;
    cur = nodes[cur].prev;
  }
  // reverse in place
  for (int64_t i = 0; i < m / 2; ++i) {
    std::swap(out_video[i], out_video[m - 1 - i]);
    std::swap(out_audio[i], out_audio[m - 1 - i]);
  }
  *out_len = m;
  return 0;
}

// --------------------------------------------------------------------------
// pass-2 refinement DP
// --------------------------------------------------------------------------
// points are flattened per audio frame: for frame i, entries
// [offsets[i], offsets[i+1]) of (pj, pc, pq) = (video pos, cluster, qual),
// sorted by (video pos, cluster, qual) within the frame.
// out_path rows: (video, audio, cluster, qual, cum_qual). Returns 0 on ok.
int refine_dp(const double* pj, const int64_t* pc, const double* pq,
              const int64_t* offsets, int64_t num_audio,
              int64_t num_clusters, int64_t num_video,
              double* out_path, int64_t* out_len) {
  const double NEG_INF = -std::numeric_limits<double>::infinity();
  struct Node5 { double j, i, c, q, cum; int64_t prev; };
  std::vector<Node5> nodes;
  nodes.push_back({0, 0, -1, 0, 0, -1});  // sentinel

  struct Entry { double j, i, c, q, cum; int64_t node; };
  std::multimap<double, Entry> best;  // key: video position j
  best.insert({0.0, {0, 0, -1, 0, 0, 0}});

  struct ClusterBest { double j, i, q, cum; int64_t node; };
  std::vector<ClusterBest> clusters_best(
      static_cast<size_t>(num_clusters), {0, 0, 0, -1000, 0});

  // prev_cache[video_int] = last node placed at that integer video position
  struct CacheEntry { double j, i, c, q, cum; int64_t node; bool set; };
  std::vector<CacheEntry> prev_cache(static_cast<size_t>(num_video),
                                     {0, 0, 0, 0, NEG_INF, -1, false});
  prev_cache[0] = {0, 0, -1, 0, 0, 0, true};

  // forward_min[i] = min video pos among points at frames >= i
  std::vector<double> forward_min(static_cast<size_t>(num_audio) + 1,
                                  std::numeric_limits<double>::infinity());
  for (int64_t i = num_audio - 1; i >= 0; --i) {
    double mn = forward_min[i + 1];
    if (offsets[i] < offsets[i + 1]) mn = std::min(mn, pj[offsets[i]]);
    forward_min[i] = mn;
  }

  for (int64_t i = 0; i < num_audio; ++i) {
    for (int64_t t = offsets[i]; t < offsets[i + 1]; ++t) {
      const double j = pj[t];
      const int64_t cluster = pc[t];
      const double q = pq[t];

      auto it = best.upper_bound(j);
      auto prev = std::prev(it);
      double bj = prev->second.j, bi = prev->second.i, bc = prev->second.c,
             bq = prev->second.q, bcum = prev->second.cum;
      int64_t bnode = prev->second.node;

      const ClusterBest& cl = clusters_best[cluster];
      if (cl.cum >= bcum) {
        bj = cl.j; bi = cl.i; bq = cl.q; bcum = cl.cum;
        bc = static_cast<double>(cluster);
        bnode = cl.node;
      }
      const int64_t ji = static_cast<int64_t>(j);
      for (int64_t p = std::max<int64_t>(0, ji - 2); p <= ji; ++p) {
        if (!prev_cache[p].set) continue;
        CacheEntry node = prev_cache[p];
        double cum = node.cum;
        if (static_cast<double>(cluster) != node.c) {
          const double d = (j - node.j) - (i - node.i);
          cum -= 100.0 + 100.0 * d * d;
        }
        if (node.i >= (i - 2) && node.j <= j && cum >= bcum) {
          bj = node.j; bi = node.i; bc = node.c; bq = node.q; bcum = cum;
          bnode = node.node;
        }
      }

      const double cum = bcum + q;
      nodes.push_back({j, static_cast<double>(i),
                       static_cast<double>(cluster), q, cum, bnode});
      const int64_t node_id = static_cast<int64_t>(nodes.size()) - 1;
      prev_cache[ji] = {j, static_cast<double>(i), static_cast<double>(cluster),
                        q, cum, node_id, true};

      // NOTE: 'prev' stays valid below: erasures start at 'it' (> prev) and
      // insertion does not invalidate multimap iterators.
      const double prev_entry_cum = prev->second.cum;
      const double cum_jump = cum - 1000.0;
      if (prev_entry_cum < cum_jump) {
        while (it != best.end() && it->second.cum <= cum_jump) {
          it = best.erase(it);
        }
        best.insert(it, {j, {j, static_cast<double>(i),
                             static_cast<double>(cluster), q, cum_jump,
                             node_id}});
      }
      if (forward_min[i] == j && prev != best.begin()) {
        // prune entries strictly before the old last-<=-j entry (reference
        // 978-979 keeps that entry plus any newly inserted jump entry)
        best.erase(best.begin(), prev);
      }
      const double cum_cluster = cum - 50.0;
      if (cl.cum < cum_cluster) {
        clusters_best[cluster] = {j, static_cast<double>(i), q, cum_cluster,
                                  node_id};
      }
    }
  }

  // backtrace from the entry with the highest cum (map invariant: last)
  int64_t cur = best.rbegin()->second.node;
  std::vector<int64_t> chain;
  while (cur > 0) {
    chain.push_back(cur);
    cur = nodes[cur].prev;
  }
  int64_t m = static_cast<int64_t>(chain.size());
  for (int64_t k = 0; k < m; ++k) {
    const Node5& nd = nodes[chain[m - 1 - k]];
    out_path[k * 5 + 0] = nd.j;
    out_path[k * 5 + 1] = nd.i;
    out_path[k * 5 + 2] = nd.c;
    out_path[k * 5 + 3] = nd.q;
    out_path[k * 5 + 4] = nd.cum;
  }
  *out_len = m;
  return 0;
}

}  // extern "C"
