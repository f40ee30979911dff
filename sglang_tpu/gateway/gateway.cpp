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
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
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
  std::atomic<int64_t> in_flight{0};
  std::atomic<int64_t> total{0};
  PrefixTree tree;
  std::mutex tree_mu;
};

struct Gateway {
  std::vector<std::unique_ptr<Worker>> workers;
  std::string policy = "cache_aware";
  double cache_threshold = 0.5;
  std::atomic<uint64_t> rr{0};

  // Pick a worker (reference cache_aware.rs decision: best prefix match
  // if above threshold AND load roughly balanced; else shortest queue).
  Worker* pick(const std::string& text) {
    if (workers.empty()) return nullptr;
    if (policy == "round_robin" || text.empty()) {
      return workers[rr++ % workers.size()].get();
    }
    // shortest queue; ties break on fewest total routed so idle
    // workers still spread (reference worker_manager load tracking)
    Worker* shortest = workers[0].get();
    for (auto& w : workers) {
      if (w->in_flight < shortest->in_flight ||
          (w->in_flight == shortest->in_flight &&
           w->total < shortest->total))
        shortest = w.get();
    }
    if (policy == "shortest_queue") return shortest;

    // cache_aware
    Worker* best = nullptr;
    size_t best_len = 0;
    int64_t min_load = INT64_MAX, max_load = 0;
    for (auto& w : workers) {
      min_load = std::min(min_load, w->in_flight.load());
      max_load = std::max(max_load, w->in_flight.load());
      std::lock_guard<std::mutex> g(w->tree_mu);
      size_t m = w->tree.match_len(text);
      if (m > best_len) {
        best_len = m;
        best = w.get();
      }
    }
    bool imbalanced =
        (max_load - min_load) > 8 && max_load > 2 * std::max<int64_t>(min_load, 1);
    double frac = text.empty() ? 0.0 : double(best_len) / double(text.size());
    Worker* chosen =
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
    std::string j = "{\"workers\":[";
    for (size_t i = 0; i < g_gateway.workers.size(); ++i) {
      auto& w = g_gateway.workers[i];
      if (i) j += ",";
      j += "{\"host\":\"" + w->host + "\",\"port\":" +
           std::to_string(w->port) + ",\"in_flight\":" +
           std::to_string(w->in_flight.load()) + ",\"total\":" +
           std::to_string(w->total.load()) + "}";
    }
    j += "],\"requests\":" + std::to_string(g_requests.load()) + "}";
    std::string resp = "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
                       "Content-Length: " + std::to_string(j.size()) +
                       "\r\nConnection: close\r\n\r\n" + j;
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }

  Worker* w = g_gateway.pick(cache_key(body));
  if (!w) {
    std::string resp = "HTTP/1.1 503 Service Unavailable\r\nContent-Length: "
                       "0\r\nConnection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
    return;
  }
  ++g_requests;
  ++w->in_flight;
  ++w->total;
  int ufd = connect_to(w->host, w->port);
  if (ufd < 0) {
    --w->in_flight;
    std::string resp = "HTTP/1.1 502 Bad Gateway\r\nContent-Length: 0\r\n"
                       "Connection: close\r\n\r\n";
    send_all(cfd, resp.data(), resp.size());
    close(cfd);
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
  bool ok = send_all(ufd, fwd_head.data(), fwd_head.size()) &&
            (body.empty() || send_all(ufd, body.data(), body.size()));
  if (ok) {
    char tmp[16384];
    ssize_t n;
    while ((n = recv(ufd, tmp, sizeof(tmp), 0)) > 0) {
      if (!send_all(cfd, tmp, n)) break;  // SSE chunks relay as they land
    }
  }
  close(ufd);
  --w->in_flight;
  close(cfd);
}

}  // namespace

int main(int argc, char** argv) {
  signal(SIGPIPE, SIG_IGN);
  int port = 8080;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--policy" && i + 1 < argc) g_gateway.policy = argv[++i];
    else if (a == "--cache-threshold" && i + 1 < argc)
      g_gateway.cache_threshold = atof(argv[++i]);
    else if (a == "--worker" && i + 1 < argc) {
      std::string spec = argv[++i];
      size_t c = spec.rfind(':');
      auto w = std::make_unique<Worker>();
      w->host = spec.substr(0, c);
      w->port = atoi(spec.c_str() + c + 1);
      g_gateway.workers.push_back(std::move(w));
    }
  }
  if (g_gateway.workers.empty()) {
    fprintf(stderr, "gateway: no --worker given\n");
    return 1;
  }
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
    std::thread(serve_client, cfd).detach();
  }
}
