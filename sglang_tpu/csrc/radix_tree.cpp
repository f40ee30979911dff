// Native radix tree over token sequences → KV page ids.
//
// Equivalent role to the reference's mem_cache/cpp_radix_tree/tree_v2.cpp
// (pybind11 "tree_v2" used under --radix-cache-cpp): the scheduler-hot-loop
// prefix matching/insert/evict without Python object overhead.  Exposed via
// a C ABI (ctypes binding in ../core/radix_cache_cpp.py — the image ships
// no pybind11).
//
// Semantics mirror core/radix_cache.py exactly:
//  * children keyed by the first page (page_size tokens) of the edge
//  * only full pages are cached; match/insert align to page_size
//  * partially matched edges are split at page boundaries
//  * LRU eviction over unlocked leaves (monotonic touch counter)
//  * lock_ref protects root→node paths; evictable/protected page counters

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <queue>
#include <vector>

namespace {

using i32 = int32_t;
using i64 = int64_t;

struct Node;

struct KeyView {
  // First-page key for the child map (owned copy, page_size tokens max).
  std::vector<i32> toks;
  bool operator<(const KeyView& o) const { return toks < o.toks; }
};

struct Node {
  Node* parent = nullptr;
  std::map<KeyView, Node*> children;
  std::vector<i32> key;    // edge tokens
  std::vector<i32> pages;  // page ids, key.size() / page_size entries
  i64 lock_ref = 0;
  uint64_t last_access = 0;
  uint64_t hits = 0;
};

struct Tree {
  i64 page_size = 1;
  Node root;
  uint64_t clock = 0;
  i64 evictable = 0;
  i64 protected_ = 0;

  uint64_t tick() { return ++clock; }
};

KeyView child_key(const Tree* t, const i32* toks, i64 n) {
  KeyView k;
  i64 m = n < t->page_size ? n : t->page_size;
  k.toks.assign(toks, toks + m);
  return k;
}

void free_subtree(Node* n) {
  for (auto& kv : n->children) free_subtree(kv.second);
  delete n;
}

// Split node's edge after `split_tokens` (page-aligned); returns upper node.
Node* split_node(Tree* t, Node* node, i64 split_tokens) {
  Node* upper = new Node();
  i64 sp = split_tokens / t->page_size;
  upper->key.assign(node->key.begin(), node->key.begin() + split_tokens);
  upper->pages.assign(node->pages.begin(), node->pages.begin() + sp);
  upper->parent = node->parent;
  upper->lock_ref = node->lock_ref;
  upper->last_access = node->last_access;

  node->key.erase(node->key.begin(), node->key.begin() + split_tokens);
  node->pages.erase(node->pages.begin(), node->pages.begin() + sp);

  upper->children[child_key(t, node->key.data(), (i64)node->key.size())] =
      node;
  upper->parent->children[child_key(t, upper->key.data(),
                                    (i64)upper->key.size())] = upper;
  node->parent = upper;
  return upper;
}

}  // namespace

extern "C" {

void* rt_new(i64 page_size) {
  Tree* t = new Tree();
  t->page_size = page_size;
  t->root.lock_ref = 1;
  return t;
}

void rt_delete(void* tp) {
  Tree* t = (Tree*)tp;
  for (auto& kv : t->root.children) free_subtree(kv.second);
  delete t;
}

void rt_reset(void* tp) {
  Tree* t = (Tree*)tp;
  for (auto& kv : t->root.children) free_subtree(kv.second);
  t->root.children.clear();
  t->evictable = 0;
  t->protected_ = 0;
}

// Longest cached prefix. Writes page ids into out_pages (capacity cap),
// returns the number of pages written; *out_node = deepest matched node.
i64 rt_match_prefix(void* tp, const i32* key, i64 n, i32* out_pages, i64 cap,
                    void** out_node) {
  Tree* t = (Tree*)tp;
  n = n / t->page_size * t->page_size;
  Node* node = &t->root;
  node->last_access = t->tick();
  i64 written = 0;
  i64 off = 0;
  while (off < n) {
    auto it = node->children.find(child_key(t, key + off, n - off));
    if (it == node->children.end()) break;
    Node* child = it->second;
    child->last_access = t->tick();
    child->hits++;
    i64 klen = (i64)child->key.size();
    i64 lim = klen < (n - off) ? klen : (n - off);
    i64 m = 0;
    while (m < lim && child->key[m] == key[off + m]) m++;
    m = m / t->page_size * t->page_size;
    if (m == 0) break;
    if (m < klen) {
      child = split_node(t, child, m);
      for (i32 p : child->pages)
        if (written < cap) out_pages[written++] = p;
      node = child;
      break;
    }
    for (i32 p : child->pages)
      if (written < cap) out_pages[written++] = p;
    node = child;
    off += m;
  }
  *out_node = node == &t->root ? nullptr : (void*)node;
  return written;
}

// Insert page-aligned key+pages; returns tokens of already-cached prefix
// (caller frees the duplicate pages covering it).
i64 rt_insert(void* tp, const i32* key, i64 n, const i32* pages, i64 npages) {
  Tree* t = (Tree*)tp;
  n = n / t->page_size * t->page_size;
  if (npages > n / t->page_size) npages = n / t->page_size;
  Node* node = &t->root;
  i64 off = 0, poff = 0, total_matched = 0;
  while (off < n) {
    node->last_access = t->tick();
    auto it = node->children.find(child_key(t, key + off, n - off));
    if (it == node->children.end()) {
      Node* nn = new Node();
      nn->key.assign(key + off, key + n);
      nn->pages.assign(pages + poff, pages + npages);
      nn->parent = node;
      nn->last_access = t->tick();
      node->children[child_key(t, key + off, n - off)] = nn;
      t->evictable += (i64)nn->pages.size();
      break;
    }
    Node* child = it->second;
    i64 klen = (i64)child->key.size();
    i64 lim = klen < (n - off) ? klen : (n - off);
    i64 m = 0;
    while (m < lim && child->key[m] == key[off + m]) m++;
    m = m / t->page_size * t->page_size;
    if (m == 0) return -1;  // child-key collision: cannot happen
    if (m < klen) child = split_node(t, child, m);
    total_matched += m;
    off += m;
    poff += m / t->page_size;
    node = child;
  }
  return total_matched;
}

void rt_lock(void* tp, void* np) {
  Tree* t = (Tree*)tp;
  for (Node* n = (Node*)np; n && n != &t->root; n = n->parent) {
    if (n->lock_ref == 0) {
      t->evictable -= (i64)n->pages.size();
      t->protected_ += (i64)n->pages.size();
    }
    n->lock_ref++;
  }
}

void rt_unlock(void* tp, void* np) {
  Tree* t = (Tree*)tp;
  for (Node* n = (Node*)np; n && n != &t->root; n = n->parent) {
    n->lock_ref--;
    if (n->lock_ref == 0) {
      t->evictable += (i64)n->pages.size();
      t->protected_ -= (i64)n->pages.size();
    }
  }
}

// Evict up to num_pages from unlocked LRU leaves; freed page ids are
// written to out_freed (capacity cap). Returns the count written.
i64 rt_evict(void* tp, i64 num_pages, i32* out_freed, i64 cap) {
  Tree* t = (Tree*)tp;
  using Entry = std::pair<uint64_t, Node*>;
  auto cmp = [](const Entry& a, const Entry& b) { return a.first > b.first; };
  std::priority_queue<Entry, std::vector<Entry>, decltype(cmp)> heap(cmp);

  // collect unlocked leaves
  std::vector<Node*> stack;
  for (auto& kv : t->root.children) stack.push_back(kv.second);
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    if (n->children.empty()) {
      if (n->lock_ref == 0) heap.push({n->last_access, n});
    } else {
      for (auto& kv : n->children) stack.push_back(kv.second);
    }
  }

  i64 evicted = 0;
  while (!heap.empty() && evicted < num_pages) {
    Node* n = heap.top().second;
    heap.pop();
    for (i32 p : n->pages)
      if (evicted < cap) out_freed[evicted++] = p;
    t->evictable -= (i64)n->pages.size();
    Node* parent = n->parent;
    parent->children.erase(
        child_key(t, n->key.data(), (i64)n->key.size()));
    delete n;
    if (parent != &t->root && parent->children.empty() &&
        parent->lock_ref == 0)
      heap.push({parent->last_access, parent});
  }
  return evicted;
}

i64 rt_evictable(void* tp) { return ((Tree*)tp)->evictable; }
i64 rt_protected(void* tp) { return ((Tree*)tp)->protected_; }

}  // extern "C"
