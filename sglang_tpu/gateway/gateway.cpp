// sglang-tpu model gateway: HTTP reverse proxy with cache-aware load
// balancing across engine workers.
//
// Equivalent role to the reference's Rust sgl-model-gateway
// (sgl-model-gateway/src/): worker registry (core/worker_manager.rs),
// LB policies (policies/{round_robin,cache_aware,...}.rs — cache_aware
// keeps an APPROXIMATE per-worker character-level radix tree of routed
// request prefixes, cache_aware.rs:1-45 + tree.rs:246), HTTP data plane
// (routers/http/).  C++17 single binary (Rust is not in this image),
// thread-per-connection; responses (including SSE streams) relay as raw
// bytes so streaming works unchanged.
//
// Usage:
//   gateway --port 8080 --worker 127.0.0.1:9001 --worker 127.0.0.1:9002 \
//           [--policy cache_aware|round_robin|shortest_queue]
//           [--cache-threshold 0.5]

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <climits>
#include <sstream>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <chrono>
#include <condition_variable>
#include <deque>
#include <thread>
#include <utility>
#include <vector>

namespace {

// ------------------------------------------------------------- radix tree
// Approximate character-level radix tree of recently routed prefixes
// (reference policies/tree.rs).  Node count capped; oldest leaves evict.
struct TreeNode {
  std::map<char, std::unique_ptr<TreeNode>> children;
  uint64_t last_used = 0;
};

class PrefixTree {
 public:
  explicit PrefixTree(size_t max_nodes = 1 << 16) : max_nodes_(max_nodes) {}

  size_t match_len(const std::string& text) const {
    const TreeNode* node = &root_;
    size_t n = 0;
    for (char c : text) {
      auto it = node->children.find(c);
      if (it == node->children.end()) break;
      node = it->second.get();
      ++n;
    }
    return n;
  }

  void insert(const std::string& text, size_t cap = 256) {
    TreeNode* node = &root_;
    size_t n = 0;
    for (char c : text) {
      if (n >= cap || nodes_ >= max_nodes_) break;
      auto it = node->children.find(c);
      if (it == node->children.end()) {
        auto child = std::make_unique<TreeNode>();
        TreeNode* raw = child.get();
        node->children[c] = std::move(child);
        node = raw;
        ++nodes_;
      } else {
        node = it->second.get();
      }
      node->last_used = ++clock_;
      ++n;
    }
  }

 private:
  TreeNode root_;
  size_t max_nodes_;
  size_t nodes_ = 0;
  uint64_t clock_ = 0;
};

// ---------------------------------------------------------------- workers
struct Worker {
  std::string host;
  int port;
  // discovery-file attributes (reference worker_manager worker config):
  // weight scales the load comparison (in_flight/weight); only the
  // highest-priority healthy tier receives traffic.
  std::atomic<int> weight{1};
  std::atomic<int> priority{0};
  std::atomic<int64_t> in_flight{0};
  std::atomic<int64_t> total{0};
  std::atomic<int64_t> failures{0};   // connect/relay errors (passive)
  std::atomic<int> probe_fails{0};    // consecutive active-probe failures
  std::atomic<bool> healthy{true};
  // --- circuit breaker (reference sgl-model-gateway
  // core/circuit_breaker.rs): consecutive PASSIVE relay failures trip
  // the breaker OPEN for cb_cooldown_ms; after the cooldown exactly one
  // half-open trial request goes through — success closes the breaker,
  // failure re-opens it.  Active /health probes still handle hard-down
  // workers; the breaker reacts to flapping/overloaded ones within a
  // request, not a probe cycle.
  std::atomic<int> cb_fails{0};
  std::atomic<long long> cb_open_until_ms{0};
  std::atomic<bool> cb_half{false};
  // --- token-bucket rate limit (reference core/token_bucket.rs):
  // tb_rate tokens/s refill up to tb_burst; a request takes one token
  // or the worker is skipped this attempt (429 when every worker is
  // out of tokens).
  double tb_rate = 0;  // 0 = unlimited
  double tb_burst = 0;
  double tb_tokens = 0;
  long long tb_last_ms = 0;
  std::mutex tb_mu;
  PrefixTree tree;
  std::mutex tree_mu;
};

long long now_ms() {
  return std::chrono::duration_cast<std::chrono::milliseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

using WorkerPtr = std::shared_ptr<Worker>;

struct Gateway {
  // Registry is mutable at runtime (reference core/worker_manager.rs):
  // snapshot under the lock, relays keep their shared_ptr alive across
  // removal.
  std::vector<WorkerPtr> workers;
  std::mutex workers_mu;
  std::string policy = "cache_aware";
  double cache_threshold = 0.5;
  int max_retries = 2;          // failover attempts across workers
  int unhealthy_after = 3;      // consecutive probe failures → ejected
  int cb_failures = 5;          // passive failures → breaker OPEN
  int cb_cooldown_ms = 2000;    // OPEN duration before a half-open trial
  double default_rate = 0;      // per-worker token refill (req/s); 0=off
  double default_burst = 0;
  std::atomic<uint64_t> rr{0};

  std::vector<WorkerPtr> snapshot(bool healthy_only = true) {
    std::lock_guard<std::mutex> g(workers_mu);
    std::vector<WorkerPtr> out;
    for (auto& w : workers)
      if (!healthy_only || w->healthy) out.push_back(w);
    // all unhealthy → fall back to the full set (last-resort routing)
    if (out.empty() && healthy_only) out = workers;
    return out;
  }

  WorkerPtr add_worker(const std::string& host, int port) {
    auto w = std::make_shared<Worker>();
    w->host = host;
    w->port = port;
    std::lock_guard<std::mutex> g(workers_mu);
    workers.push_back(w);
    return w;
  }

  bool remove_worker(const std::string& host, int port) {
    std::lock_guard<std::mutex> g(workers_mu);
    for (auto it = workers.begin(); it != workers.end(); ++it) {
      if ((*it)->host == host && (*it)->port == port) {
        workers.erase(it);
        return true;
      }
    }
    return false;
  }

  // Pick a worker (reference cache_aware.rs decision: best prefix match
  // if above threshold AND load roughly balanced; else shortest queue).
  // `exclude` skips workers that already failed this request (failover).
  WorkerPtr pick(const std::string& text,
                 const std::vector<Worker*>& exclude = {}) {
    auto pool = snapshot();
    pool.erase(std::remove_if(pool.begin(), pool.end(),
                              [&](const WorkerPtr& w) {
                                return std::find(exclude.begin(),
                                                 exclude.end(),
                                                 w.get()) != exclude.end();
                              }),
               pool.end());
    if (pool.empty()) return nullptr;
    // priority tiers: only the highest-priority eligible workers route
    // (lower tiers are warm standbys that engage when the tier above
    // is unhealthy or excluded by failover)
    int max_pri = INT_MIN;
    for (auto& w : pool) max_pri = std::max(max_pri, w->priority.load());
    pool.erase(std::remove_if(pool.begin(), pool.end(),
                              [&](const WorkerPtr& w) {
                                return w->priority.load() != max_pri;
                              }),
               pool.end());
    if (policy == "round_robin" || text.empty()) {
      // weighted round robin: walk the cumulative weights
      long long W = 0;
      for (auto& w : pool) W += std::max(1, w->weight.load());
      long long t = (long long)(rr++ % (uint64_t)std::max<long long>(W, 1));
      for (auto& w : pool) {
        t -= std::max(1, w->weight.load());
        if (t < 0) return w;
      }
      return pool.back();
    }
    // weighted shortest queue (compare in_flight/weight by cross-
    // multiplying); ties break on weighted total so idle workers still
    // spread proportionally (reference worker_manager load tracking)
    auto lighter = [](const WorkerPtr& a, const WorkerPtr& b) {
      long long wa = std::max(1, a->weight.load());
      long long wb = std::max(1, b->weight.load());
      long long l = a->in_flight.load() * wb, r = b->in_flight.load() * wa;
      if (l != r) return l < r;
      return a->total.load() * wb < b->total.load() * wa;
    };
    WorkerPtr shortest = pool[0];
    for (auto& w : pool)
      if (lighter(w, shortest)) shortest = w;
    if (policy == "shortest_queue") return shortest;

    // cache_aware
    WorkerPtr best = nullptr;
    size_t best_len = 0;
    int64_t min_load = INT64_MAX, max_load = 0;
    for (auto& w : pool) {
      min_load = std::min(min_load, w->in_flight.load());
      max_load = std::max(max_load, w->in_flight.load());
      std::lock_guard<std::mutex> g(w->tree_mu);
      size_t m = w->tree.match_len(text);
      if (m > best_len) {
        best_len = m;
        best = w;
      }
    }
    bool imbalanced =
        (max_load - min_load) > 8 && max_load > 2 * std::max<int64_t>(min_load, 1);
    double frac = text.empty() ? 0.0 : double(best_len) / double(text.size());
    WorkerPtr chosen =
        (best != nullptr && frac >= cache_threshold && !imbalanced) ? best
                                                                    : shortest;
    {
      std::lock_guard<std::mutex> g(chosen->tree_mu);
      chosen->tree.insert(text);
    }
    return chosen;
  }
};

// ------------------------------------------------------------------ http
bool read_until(int fd, std::string& buf, const char* delim) {
  char tmp[4096];
  while (buf.find(delim) == std::string::npos) {
    ssize_t n = recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    buf.append(tmp, n);
    if (buf.size() > (16u << 20)) return false;
  }
  return true;
}

bool send_all(int fd, const char* data, size_t n) {
  size_t off = 0;
  while (off < n) {
    ssize_t w = send(fd, data + off, n - off, MSG_NOSIGNAL);
    if (w <= 0) return false;
    off += w;
  }
  return true;
}

long header_content_length(const std::string& head) {
  const char* keys[] = {"Content-Length:", "content-length:"};
  for (const char* k : keys) {
    size_t p = head.find(k);
    if (p != std::string::npos) return atol(head.c_str() + p + strlen(k));
  }
  return 0;
}

// Light prompt extraction for the cache key: value of "prompt"/"text"/
// "input" JSON string field, else the raw body (reference extracts the
// request text; the tree is approximate by design).
std::string cache_key(const std::string& body) {
  for (const char* field : {"\"prompt\"", "\"text\"", "\"input\""}) {
    size_t p = body.find(field);
    if (p == std::string::npos) continue;
    p = body.find(':', p);
    if (p == std::string::npos) continue;
    p = body.find('"', p);
    if (p == std::string::npos) continue;
    std::string out;
    for (size_t i = p + 1; i < body.size(); ++i) {
      if (body[i] == '\\' && i + 1 < body.size()) {
        out.push_back(body[i + 1]);
        ++i;
      } else if (body[i] == '"') {
        return out;
      } else {
        out.push_back(body[i]);
      }
    }
  }
  return body.substr(0, 512);
}

int connect_to(const std::string& host, int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
    hostent* he = gethostbyname(host.c_str());
    if (!he) {
      close(fd);
      return -1;
    }
    memcpy(&addr.sin_addr, he->h_addr, he->h_length);
  }
  if (connect(fd, (sockaddr*)&addr, sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

Gateway g_gateway;
std::atomic<int64_t> g_requests{0};
std::atomic<int64_t> g_retries{0};
std::atomic<int64_t> g_rate_limited{0};
std::atomic<int64_t> g_breaker_skips{0};
std::atomic<int64_t> g_queue_rejects{0};

// Per-attempt admission: 0 = admit, 1 = breaker open, 2 = out of tokens.
int admit_worker(const WorkerPtr& w) {
  long long now = now_ms();
  long long open_until = w->cb_open_until_ms.load();
  if (open_until > 0) {
    if (now < open_until) {
      ++g_breaker_skips;
      return 1;
    }
    bool expected = false;
    if (!w->cb_half.compare_exchange_strong(expected, true)) {
      ++g_breaker_skips;
      return 1;  // another request is already the half-open trial
    }
  }
  if (w->tb_rate > 0) {
    std::lock_guard<std::mutex> g(w->tb_mu);
    double dt = (now - w->tb_last_ms) / 1000.0;
    w->tb_last_ms = now;
    w->tb_tokens = std::min(w->tb_burst, w->tb_tokens + dt * w->tb_rate);
    if (w->tb_tokens < 1.0) {
      ++g_rate_limited;
      if (open_until > 0) w->cb_half = false;  // trial slot returns
      return 2;
    }
    w->tb_tokens -= 1.0;
  }
  return 0;
}

// Relay outcome feeds the breaker: success closes it, failure counts
// toward cb_failures (a failed half-open trial re-opens immediately).
void report_worker_result(const WorkerPtr& w, bool ok) {
  if (ok) {
    w->cb_fails = 0;
    w->cb_open_until_ms = 0;
    w->cb_half = false;
    return;
  }
  bool was_open = w->cb_open_until_ms.load() > 0;
  w->cb_half = false;
  int f = ++w->cb_fails;
  if (f >= g_gateway.cb_failures || was_open)
    w->cb_open_until_ms = now_ms() + g_gateway.cb_cooldown_ms;
}

// ------------------------------------------------------- PD routing
// (reference PD router: each /generate duplicates to a prefill worker
// and a decode worker with a shared bootstrap_room; the decode side's
// response streams back to the client while the prefill side pushes
// KV to the decode engine's bootstrap server.)
//
// Both sides are POOLS (reference pd_router decode-side balancing):
// the decode worker is picked least-in-flight (each decode engine has
// its own KV bootstrap rendezvous, carried per worker), the prefill
// worker CACHE-AWARE — the engine whose approximate prefix tree best
// matches the request keeps its radix cache hot (reference pd_router
// prefill policy), falling back to round-robin on poor matches or
// load imbalance.
struct PDWorker {
  std::string host;
  int port = 0;
  std::string bootstrap;  // decode side: its engine's bootstrap addr
  std::atomic<int64_t> in_flight{0};
  std::atomic<int64_t> total{0};
  PrefixTree tree;  // prefill side: routed-prefix cache affinity
  std::mutex tree_mu;
};
using PDWorkerPtr = std::shared_ptr<PDWorker>;

struct PDConfig {
  std::atomic<bool> enabled{false};
  std::vector<PDWorkerPtr> prefill, decode;
  std::mutex mu;
  std::atomic<uint64_t> rr{0};

  bool ready() {
    std::lock_guard<std::mutex> g(mu);
    return !prefill.empty() && !decode.empty();
  }
  PDWorkerPtr pick_prefill(const std::string& key, double threshold) {
    std::vector<PDWorkerPtr> pool;
    {
      std::lock_guard<std::mutex> g(mu);
      pool = prefill;
    }
    if (pool.empty()) return nullptr;
    PDWorkerPtr chosen;
    if (!key.empty() && pool.size() > 1) {
      PDWorkerPtr best = nullptr;
      size_t best_len = 0;
      int64_t min_load = INT64_MAX, max_load = 0;
      for (auto& w : pool) {
        min_load = std::min(min_load, w->in_flight.load());
        max_load = std::max(max_load, w->in_flight.load());
        std::lock_guard<std::mutex> g(w->tree_mu);
        size_t m = w->tree.match_len(key);
        if (m > best_len) {
          best_len = m;
          best = w;
        }
      }
      bool imbalanced = (max_load - min_load) > 8 &&
                        max_load > 2 * std::max<int64_t>(min_load, 1);
      double frac = double(best_len) / double(key.size());
      if (best && frac >= threshold && !imbalanced) chosen = best;
    }
    if (!chosen) chosen = pool[rr++ % pool.size()];
    if (!key.empty()) {
      std::lock_guard<std::mutex> g(chosen->tree_mu);
      chosen->tree.insert(key);
    }
    return chosen;
  }
  PDWorkerPtr pick_decode() {
    std::lock_guard<std::mutex> g(mu);
    PDWorkerPtr best = nullptr;
    for (auto& w : decode)
      if (!best || w->in_flight < best->in_flight ||
          (w->in_flight == best->in_flight && w->total < best->total))
        best = w;
    return best;
  }
  void add(bool is_prefill, const std::string& host, int port,
           const std::string& bootstrap) {
    auto w = std::make_shared<PDWorker>();
    w->host = host;
    w->port = port;
    w->bootstrap = bootstrap;
    std::lock_guard<std::mutex> g(mu);
    auto& pool = is_prefill ? prefill : decode;
    for (auto& e : pool)
      if (e->host == host && e->port == port) return;  // already present
    pool.push_back(w);
  }
  bool remove(bool is_prefill, const std::string& host, int port) {
    std::lock_guard<std::mutex> g(mu);
    auto& pool = is_prefill ? prefill : decode;
    for (auto it = pool.begin(); it != pool.end(); ++it)
      if ((*it)->host == host && (*it)->port == port) {
        pool.erase(it);
        return true;
      }
    return false;
  }
} g_pd;

std::string inject_json_fields(const std::string& body,
                               const std::string& fields) {
  size_t p = body.find('{');
  if (p == std::string::npos) return "{" + fields + "}";
  std::string rest = body.substr(p + 1);
  // empty object? avoid trailing comma
  size_t q = rest.find_first_not_of(" \t\r\n");
  bool empty = q != std::string::npos && rest[q] == '}';
  return body.substr(0, p + 1) + fields + (empty ? "" : ",") + rest;
}

std::string rebuild_head(const std::string& head, size_t body_len) {
  std::string h = head;
  for (const char* k : {"Content-Length:", "content-length:"}) {
    size_t p = h.find(k);
    if (p != std::string::npos) {
      size_t eol = h.find("\r\n", p);
      h.erase(p, eol - p);
      h.insert(p, std::string("Content-Length: ") +
                     std::to_string(body_len));
      return h;
    }
  }
  h.insert(h.size() - 2,
           "Content-Length: " + std::to_string(body_len) + "\r\n");
  return h;
}

// POST to one host, relay response bytes to cfd (or drop when cfd<0).
bool forward_once(const std::string& host, int port,
                  const std::string& head, const std::string& body,
                  int cfd) {
  int ufd = connect_to(host, port);
  if (ufd < 0) return false;
  bool ok = send_all(ufd, head.data(), head.size()) &&
            send_all(ufd, body.data(), body.size());
  bool any = false;
  if (ok) {
    char tmp[16384];
    ssize_t n;
    while ((n = recv(ufd, tmp, sizeof(tmp), 0)) > 0) {
      any = true;
      if (cfd >= 0 && !send_all(cfd, tmp, n)) break;
    }
  }
  close(ufd);
  return ok && any;
}

void serve_pd(int cfd, const std::string& head, const std::string& body) {
  static std::atomic<uint64_t> room_ctr{0};
  PDWorkerPtr dec = g_pd.pick_decode();
  PDWorkerPtr pre =
      g_pd.pick_prefill(cache_key(body), g_gateway.cache_threshold);
  if (!dec || !pre) {
    std::string resp = "HTTP/1.1 503 Service Unavailable\r\n"
                       "Content-Length: 0\r\nConnection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }
  char room[64];
  snprintf(room, sizeof(room), "gwroom-%llu-%d",
           (unsigned long long)(++room_ctr), (int)getpid());
  // the prefill engine streams KV to the CHOSEN decode engine's
  // bootstrap rendezvous — the room + bootstrap pair rides the request
  std::string pre_body = inject_json_fields(
      body, std::string("\"pd_role\":\"prefill\",\"bootstrap_room\":\"") +
                room + "\",\"pd_bootstrap\":\"" + dec->bootstrap + "\"");
  std::string dec_body = inject_json_fields(
      body, std::string("\"pd_role\":\"decode\",\"bootstrap_room\":\"") +
                room + "\"");
  // prefill fires on its own thread (its KV lands at the bootstrap
  // server); the decode response relays to the client
  std::string pre_head = rebuild_head(head, pre_body.size());
  ++pre->total;
  ++pre->in_flight;
  std::thread([pre, pre_head, pre_body]() {
    forward_once(pre->host, pre->port, pre_head, pre_body, -1);
    --pre->in_flight;
  }).detach();
  std::string dec_head = rebuild_head(head, dec_body.size());
  ++dec->in_flight;
  ++dec->total;
  bool ok = forward_once(dec->host, dec->port, dec_head, dec_body, cfd);
  --dec->in_flight;
  if (!ok) {
    std::string resp = "HTTP/1.1 502 Bad Gateway\r\nContent-Length: 0\r\n"
                       "Connection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
  }
  close(cfd);
}

// -------------------------------------------------------------- health
// Active health checks (reference worker_manager health loop): probe
// GET /health on every registered worker; `unhealthy_after` consecutive
// failures eject it from routing, one success re-admits it.
bool probe_worker(const WorkerPtr& w, int timeout_ms = 2000) {
  int fd = connect_to(w->host, w->port);
  if (fd < 0) return false;
  timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  std::string req = "GET /health HTTP/1.1\r\nHost: " + w->host +
                    "\r\nConnection: close\r\n\r\n";
  bool ok = send_all(fd, req.data(), req.size());
  char buf[256] = {0};
  ssize_t n = ok ? recv(fd, buf, sizeof(buf) - 1, 0) : -1;
  close(fd);
  return n > 0 && strstr(buf, " 200 ") != nullptr;
}

void health_loop(int interval_ms) {
  while (true) {
    for (auto& w : g_gateway.snapshot(/*healthy_only=*/false)) {
      bool ok = probe_worker(w);
      if (ok) {
        w->probe_fails = 0;
        if (!w->healthy.exchange(true))
          fprintf(stderr, "gateway: worker %s:%d recovered\n",
                  w->host.c_str(), w->port);
      } else if (++w->probe_fails >= g_gateway.unhealthy_after) {
        if (w->healthy.exchange(false))
          fprintf(stderr, "gateway: worker %s:%d marked UNHEALTHY\n",
                  w->host.c_str(), w->port);
      }
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(interval_ms));
  }
}

// ---------------------------------------------------------- discovery
// File-based endpoint discovery (the reference gateway's K8s service
// discovery role, worker_manager.rs watcher — here the control plane
// is a file an operator/sidecar rewrites; the gateway polls and
// reconciles).  Line formats:
//   host:port                      regular worker
//   prefill=host:port              PD prefill worker
//   decode=host:port=bs_host:port  PD decode worker + its KV bootstrap
//   # comment / blank lines ignored
std::string g_discovery_file;

bool split_hostport(const std::string& s, std::string& host, int& port) {
  size_t c = s.rfind(':');
  if (c == std::string::npos) return false;
  host = s.substr(0, c);
  port = atoi(s.c_str() + c + 1);
  return !host.empty() && port > 0;
}

void reconcile_discovery() {
  std::ifstream f(g_discovery_file);
  if (!f.good()) return;
  std::set<std::pair<std::string, int>> want, want_pre, want_dec;
  std::string line;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == ' '))
      line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    std::string host;
    int port = 0;
    if (line.rfind("prefill=", 0) == 0) {
      if (split_hostport(line.substr(8), host, port)) {
        want_pre.insert({host, port});
        g_pd.add(true, host, port, "");
      }
    } else if (line.rfind("decode=", 0) == 0) {
      std::string rest = line.substr(7);
      size_t eq = rest.find('=');
      std::string bootstrap =
          eq == std::string::npos ? "" : rest.substr(eq + 1);
      if (split_hostport(rest.substr(0, eq), host, port)) {
        want_dec.insert({host, port});
        g_pd.add(false, host, port, bootstrap);
      }
    } else {
      // regular worker line:
      //   "host:port [weight=N] [priority=N] [rate=R[:BURST]]"
      std::string ep = line;
      int wgt = 1, pri = 0;
      double rate = g_gateway.default_rate;
      double burst = g_gateway.default_burst;
      size_t sp = line.find(' ');
      if (sp != std::string::npos) {
        ep = line.substr(0, sp);
        std::istringstream attrs(line.substr(sp + 1));
        std::string tok;
        while (attrs >> tok) {
          if (tok.rfind("weight=", 0) == 0)
            wgt = std::max(1, atoi(tok.c_str() + 7));
          else if (tok.rfind("priority=", 0) == 0)
            pri = atoi(tok.c_str() + 9);
          else if (tok.rfind("rate=", 0) == 0) {
            std::string spec = tok.substr(5);
            size_t c = spec.find(':');
            rate = atof(spec.c_str());
            burst = c == std::string::npos ? std::max(1.0, rate)
                                           : atof(spec.c_str() + c + 1);
          }
        }
      }
      if (split_hostport(ep, host, port)) {
        want.insert({host, port});
        WorkerPtr have;
        for (auto& w : g_gateway.snapshot(false))
          if (w->host == host && w->port == port) have = w;
        if (!have) {
          have = g_gateway.add_worker(host, port);
          fprintf(stderr, "gateway: discovered worker %s:%d\n",
                  host.c_str(), port);
          std::lock_guard<std::mutex> g(have->tb_mu);
          have->tb_rate = rate;
          have->tb_burst = burst;
          have->tb_tokens = burst;
          have->tb_last_ms = now_ms();
        } else if (have->tb_rate != rate || have->tb_burst != burst) {
          std::lock_guard<std::mutex> g(have->tb_mu);
          have->tb_rate = rate;
          have->tb_burst = burst;
          have->tb_tokens = std::min(have->tb_tokens, burst);
        }
        have->weight = wgt;      // live-updated on every reconcile
        have->priority = pri;
      }
    }
  }
  // The file is the source of truth for every endpoint KIND it has
  // ever listed (CLI-seeded workers of other kinds are left alone):
  // drop endpoints it no longer lists.
  static bool seen_regular = false, seen_pre = false, seen_dec = false;
  seen_regular |= !want.empty();
  seen_pre |= !want_pre.empty();
  seen_dec |= !want_dec.empty();
  if (seen_regular)
    for (auto& w : g_gateway.snapshot(false))
      if (!want.count({w->host, w->port})) {
        g_gateway.remove_worker(w->host, w->port);
        fprintf(stderr, "gateway: worker %s:%d left discovery\n",
                w->host.c_str(), w->port);
      }
  std::vector<std::pair<bool, std::pair<std::string, int>>> drop;
  {
    std::lock_guard<std::mutex> g(g_pd.mu);
    if (seen_pre)
      for (auto& w : g_pd.prefill)
        if (!want_pre.count({w->host, w->port}))
          drop.push_back({true, {w->host, w->port}});
    if (seen_dec)
      for (auto& w : g_pd.decode)
        if (!want_dec.count({w->host, w->port}))
          drop.push_back({false, {w->host, w->port}});
  }
  for (auto& d : drop)
    g_pd.remove(d.first, d.second.first, d.second.second);
  g_pd.enabled = g_pd.ready();
}

void discovery_loop(int interval_ms) {
  while (true) {
    reconcile_discovery();
    std::this_thread::sleep_for(std::chrono::milliseconds(interval_ms));
  }
}

// "host:port" out of a JSON body {"url": "host:port"} or raw host:port
bool parse_worker_spec(const std::string& body, std::string& host,
                       int& port) {
  std::string s = body;
  size_t p = s.find("\"url\"");
  if (p != std::string::npos) {
    p = s.find('"', s.find(':', p));
    if (p == std::string::npos) return false;
    size_t e = s.find('"', p + 1);
    if (e == std::string::npos) return false;
    s = s.substr(p + 1, e - p - 1);
  }
  size_t c = s.rfind(':');
  if (c == std::string::npos) return false;
  host = s.substr(0, c);
  port = atoi(s.c_str() + c + 1);
  return !host.empty() && port > 0;
}

void serve_client(int cfd) {
  std::string buf;
  if (!read_until(cfd, buf, "\r\n\r\n")) {
    close(cfd);
    return;
  }
  size_t head_end = buf.find("\r\n\r\n") + 4;
  std::string head = buf.substr(0, head_end);
  long clen = header_content_length(head);
  while ((long)(buf.size() - head_end) < clen) {
    char tmp[8192];
    ssize_t n = recv(cfd, tmp, sizeof(tmp), 0);
    if (n <= 0) {
      close(cfd);
      return;
    }
    buf.append(tmp, n);
  }
  std::string body = buf.substr(head_end, clen);

  // gateway-local endpoints
  if (head.rfind("GET /gateway/health", 0) == 0) {
    std::string resp =
        "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nok";
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }
  if (head.rfind("GET /gateway/workers", 0) == 0) {
    auto pool = g_gateway.snapshot(/*healthy_only=*/false);
    std::string j = "{\"workers\":[";
    for (size_t i = 0; i < pool.size(); ++i) {
      auto& w = pool[i];
      if (i) j += ",";
      j += "{\"host\":\"" + w->host + "\",\"port\":" +
           std::to_string(w->port) + ",\"in_flight\":" +
           std::to_string(w->in_flight.load()) + ",\"total\":" +
           std::to_string(w->total.load()) + ",\"failures\":" +
           std::to_string(w->failures.load()) + ",\"weight\":" +
           std::to_string(w->weight.load()) + ",\"priority\":" +
           std::to_string(w->priority.load()) + ",\"healthy\":" +
           (w->healthy ? "true" : "false") + ",\"breaker_open\":" +
           (w->cb_open_until_ms.load() > now_ms() ? "true" : "false") +
           ",\"rate\":" + std::to_string(w->tb_rate) + "}";
    }
    j += "],\"requests\":" + std::to_string(g_requests.load()) +
         ",\"retries\":" + std::to_string(g_retries.load()) +
         ",\"rate_limited\":" + std::to_string(g_rate_limited.load()) +
         ",\"breaker_skips\":" + std::to_string(g_breaker_skips.load()) +
         ",\"queue_rejects\":" + std::to_string(g_queue_rejects.load());
    {
      std::lock_guard<std::mutex> g(g_pd.mu);
      auto dump = [](const std::vector<PDWorkerPtr>& pool) {
        std::string s = "[";
        for (size_t i = 0; i < pool.size(); ++i) {
          auto& w = pool[i];
          if (i) s += ",";
          s += "{\"host\":\"" + w->host + "\",\"port\":" +
               std::to_string(w->port) + ",\"in_flight\":" +
               std::to_string(w->in_flight.load()) + ",\"total\":" +
               std::to_string(w->total.load()) + ",\"bootstrap\":\"" +
               w->bootstrap + "\"}";
        }
        return s + "]";
      };
      j += ",\"pd_prefill\":" + dump(g_pd.prefill) +
           ",\"pd_decode\":" + dump(g_pd.decode);
    }
    j += "}";
    std::string resp = "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
                       "Content-Length: " + std::to_string(j.size()) +
                       "\r\nConnection: close\r\n\r\n" + j;
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }
  // worker registry admin (reference worker_manager add/remove routes)
  if (head.rfind("POST /gateway/add_worker", 0) == 0 ||
      head.rfind("POST /gateway/remove_worker", 0) == 0) {
    std::string host;
    int port = 0;
    bool add = head.rfind("POST /gateway/add_worker", 0) == 0;
    bool ok = parse_worker_spec(body, host, port);
    if (ok && add) {
      g_gateway.add_worker(host, port);
      fprintf(stderr, "gateway: worker %s:%d added\n", host.c_str(), port);
    } else if (ok) {
      ok = g_gateway.remove_worker(host, port);
      if (ok)
        fprintf(stderr, "gateway: worker %s:%d removed\n", host.c_str(),
                port);
    }
    std::string resp = ok
        ? "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nok"
        : "HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n"
          "Connection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }

  if (g_pd.enabled && head.rfind("POST /generate", 0) == 0) {
    std::string fwd = head;
    size_t cp2 = fwd.find("Connection:");
    if (cp2 == std::string::npos) cp2 = fwd.find("connection:");
    if (cp2 != std::string::npos) {
      size_t eol = fwd.find("\r\n", cp2);
      fwd.erase(cp2, eol + 2 - cp2);
    }
    fwd.insert(fwd.size() - 2, "Connection: close\r\n");
    ++g_requests;
    serve_pd(cfd, fwd, body);
    return;
  }

  // force upstream connection close so EOF terminates the relay
  std::string fwd_head = head;
  size_t cp = fwd_head.find("Connection:");
  if (cp == std::string::npos) cp = fwd_head.find("connection:");
  if (cp != std::string::npos) {
    size_t eol = fwd_head.find("\r\n", cp);
    fwd_head.erase(cp, eol + 2 - cp);
  }
  fwd_head.insert(fwd_head.size() - 2, "Connection: close\r\n");

  // Route with failover: a connect/early-send failure moves to the next
  // worker (up to max_retries); once bytes have streamed back, no retry.
  std::string key = cache_key(body);
  std::vector<Worker*> tried;
  bool responded = false;
  bool saw_rate_limit = false;
  // retries also cover breaker-open / rate-limited skips: a skipped
  // worker joins `tried` and the loop moves to the next candidate
  int budget = g_gateway.max_retries + 4;
  for (int attempt = 0; attempt <= budget; ++attempt) {
    WorkerPtr w = g_gateway.pick(key, tried);
    if (!w) break;
    tried.push_back(w.get());
    int adm = admit_worker(w);
    if (adm != 0) {
      if (adm == 2) saw_rate_limit = true;
      continue;
    }
    if (attempt > 0) ++g_retries;
    int ufd = connect_to(w->host, w->port);
    if (ufd < 0) {
      ++w->failures;
      report_worker_result(w, false);
      if (++w->probe_fails >= g_gateway.unhealthy_after)
        w->healthy = false;  // passive ejection; probe loop re-admits
      continue;
    }
    ++g_requests;
    ++w->in_flight;
    ++w->total;
    bool sent = send_all(ufd, fwd_head.data(), fwd_head.size()) &&
                (body.empty() || send_all(ufd, body.data(), body.size()));
    bool any_bytes = false;
    if (sent) {
      char tmp[16384];
      ssize_t n;
      while ((n = recv(ufd, tmp, sizeof(tmp), 0)) > 0) {
        any_bytes = true;
        if (!send_all(cfd, tmp, n)) break;  // SSE chunks relay as they land
      }
    }
    close(ufd);
    --w->in_flight;
    w->probe_fails = 0;
    if (sent && any_bytes) {
      report_worker_result(w, true);
      responded = true;
      break;
    }
    ++w->failures;  // upstream died before responding: fail over
    report_worker_result(w, false);
  }
  if (!responded) {
    std::string resp =
        saw_rate_limit
            ? "HTTP/1.1 429 Too Many Requests\r\nContent-Length: 0\r\n"
              "Connection: close\r\n\r\n"
            : "HTTP/1.1 502 Bad Gateway\r\nContent-Length: 0\r\n"
              "Connection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
  }
  close(cfd);
}

// ------------------------------------------------ bounded connection pool
// Thread-per-connection replaced by a FIXED worker pool + bounded
// accept queue (reference gateway's bounded tokio runtime +
// concurrency limits): a slow client can hold at most one pool thread,
// and overload sheds with 503 instead of unbounded thread growth.
std::deque<int> g_connq;
std::mutex g_connq_mu;
std::condition_variable g_connq_cv;
size_t g_max_conn_queue = 256;

void conn_worker() {
  while (true) {
    int cfd;
    {
      std::unique_lock<std::mutex> l(g_connq_mu);
      g_connq_cv.wait(l, [] { return !g_connq.empty(); });
      cfd = g_connq.front();
      g_connq.pop_front();
    }
    serve_client(cfd);
  }
}

}  // namespace

int main(int argc, char** argv) {
  signal(SIGPIPE, SIG_IGN);
  int port = 8080;
  int health_interval_ms = 2000;
  int max_conn_threads = 64;
  int discovery_interval_ms = 1000;
  std::string pd_default_bootstrap;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--policy" && i + 1 < argc) g_gateway.policy = argv[++i];
    else if (a == "--cache-threshold" && i + 1 < argc)
      g_gateway.cache_threshold = atof(argv[++i]);
    else if (a == "--max-retries" && i + 1 < argc)
      g_gateway.max_retries = atoi(argv[++i]);
    else if (a == "--health-interval-ms" && i + 1 < argc)
      health_interval_ms = atoi(argv[++i]);
    else if (a == "--cb-failures" && i + 1 < argc)
      g_gateway.cb_failures = atoi(argv[++i]);
    else if (a == "--cb-cooldown-ms" && i + 1 < argc)
      g_gateway.cb_cooldown_ms = atoi(argv[++i]);
    else if (a == "--rate" && i + 1 < argc) {
      // per-worker token bucket: "rate[:burst]" req/s (applied to every
      // worker after parsing; discovery lines may override per worker)
      std::string spec = argv[++i];
      size_t c = spec.find(':');
      g_gateway.default_rate = atof(spec.c_str());
      g_gateway.default_burst =
          c == std::string::npos ? std::max(1.0, g_gateway.default_rate)
                                 : atof(spec.c_str() + c + 1);
    } else if (a == "--max-conn-threads" && i + 1 < argc)
      max_conn_threads = std::max(1, atoi(argv[++i]));
    else if (a == "--conn-queue" && i + 1 < argc)
      g_max_conn_queue = (size_t)std::max(1, atoi(argv[++i]));
    else if (a == "--pd-prefill" && i + 1 < argc) {  // repeatable
      std::string host;
      int p = 0;
      if (split_hostport(argv[++i], host, p)) g_pd.add(true, host, p, "");
    } else if (a == "--pd-decode" && i + 1 < argc) {
      // repeatable; "host:port" or "host:port=bootstrap_host:port"
      std::string spec = argv[++i], host;
      int p = 0;
      size_t eq = spec.find('=');
      std::string bs = eq == std::string::npos ? "" : spec.substr(eq + 1);
      if (split_hostport(spec.substr(0, eq), host, p))
        g_pd.add(false, host, p, bs);
    } else if (a == "--pd-bootstrap" && i + 1 < argc)
      pd_default_bootstrap = argv[++i];
    else if (a == "--discovery-file" && i + 1 < argc)
      g_discovery_file = argv[++i];
    else if (a == "--discovery-interval-ms" && i + 1 < argc)
      discovery_interval_ms = atoi(argv[++i]);
    else if (a == "--worker" && i + 1 < argc) {
      std::string spec = argv[++i];
      size_t c = spec.rfind(':');
      g_gateway.add_worker(spec.substr(0, c), atoi(spec.c_str() + c + 1));
    }
  }
  {
    // --pd-bootstrap backfills decode workers given without their own
    std::lock_guard<std::mutex> g(g_pd.mu);
    for (auto& w : g_pd.decode)
      if (w->bootstrap.empty()) w->bootstrap = pd_default_bootstrap;
  }
  if (!g_discovery_file.empty()) reconcile_discovery();
  g_pd.enabled = g_pd.ready();
  if (g_pd.enabled) {
    // non-PD routes (health checks etc.) fall back to a decode worker
    std::lock_guard<std::mutex> g(g_pd.mu);
    if (g_gateway.snapshot(false).empty())
      g_gateway.add_worker(g_pd.decode[0]->host, g_pd.decode[0]->port);
    fprintf(stderr, "gateway: PD routing %zu prefill + %zu decode\n",
            g_pd.prefill.size(), g_pd.decode.size());
  }
  if (g_gateway.snapshot(false).empty() && g_discovery_file.empty()) {
    fprintf(stderr, "gateway: no --worker given\n");
    return 1;
  }
  if (g_gateway.default_rate > 0) {
    for (auto& w : g_gateway.snapshot(false)) {
      w->tb_rate = g_gateway.default_rate;
      w->tb_burst = g_gateway.default_burst;
      w->tb_tokens = g_gateway.default_burst;  // start full
      w->tb_last_ms = now_ms();
    }
  }
  if (health_interval_ms > 0)
    std::thread(health_loop, health_interval_ms).detach();
  if (!g_discovery_file.empty())
    std::thread(discovery_loop, discovery_interval_ms).detach();
  for (int i = 0; i < max_conn_threads; ++i)
    std::thread(conn_worker).detach();
  int sfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(sfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (bind(sfd, (sockaddr*)&addr, sizeof(addr)) != 0 || listen(sfd, 128) != 0) {
    perror("gateway bind/listen");
    return 1;
  }
  socklen_t alen = sizeof(addr);
  getsockname(sfd, (sockaddr*)&addr, &alen);
  fprintf(stderr, "gateway listening on port %d (%zu workers, policy=%s)\n",
          ntohs(addr.sin_port), g_gateway.workers.size(),
          g_gateway.policy.c_str());
  fflush(stderr);
  while (true) {
    int cfd = accept(sfd, nullptr, nullptr);
    if (cfd < 0) continue;
    {
      std::lock_guard<std::mutex> g(g_connq_mu);
      if (g_connq.size() >= g_max_conn_queue) {
        // overload: shed with 503 instead of queueing without bound
        ++g_queue_rejects;
        static const char resp[] =
            "HTTP/1.1 503 Service Unavailable\r\nContent-Length: 0\r\n"
            "Connection: close\r\n\r\n";
        send(cfd, resp, sizeof(resp) - 1, MSG_NOSIGNAL);
        close(cfd);
        continue;
      }
      g_connq.push_back(cfd);
    }
    g_connq_cv.notify_one();
  }
}
