// Concurrency runtime: ordered task queue for the parse||execute pipeline.
//
// Capability counterpart of /root/reference/libde265/threads.{h,cc} (thread
// pool + progress locks).  Independent design: the decoder does not need a
// per-CTB progress lattice — pictures are executed as whole-frame programs,
// so a single ordered worker queue (parse picture N+1 on the caller thread
// while picture N's pixel program executes on the worker) provides the
// frame-level overlap, and intra-picture parallelism comes from the batched
// TPU kernels instead of CTB-row threads.
#pragma once

#include <condition_variable>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <thread>

#include "tde265/common.h"

namespace tde265 {

class TaskHandle {
 public:
  void wait() {
    std::unique_lock<std::mutex> lock(m_);
    cv_.wait(lock, [this] { return done_; });
  }
  bool done() {
    std::lock_guard<std::mutex> lock(m_);
    return done_;
  }
  void mark_done() {
    {
      std::lock_guard<std::mutex> lock(m_);
      done_ = true;
    }
    cv_.notify_all();
  }

 private:
  std::mutex m_;
  std::condition_variable cv_;
  bool done_ = false;
};

// Single-worker FIFO executor: tasks run strictly in submission order
// (pixel programs of consecutive pictures have a reference dependence).
class OrderedExecutor {
 public:
  ~OrderedExecutor() { stop(); }

  void start() {
    if (running_) return;
    running_ = true;
    worker_ = std::thread([this] { run(); });
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lock(m_);
      if (!running_) return;
      running_ = false;
    }
    cv_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  bool active() const { return running_; }

  std::shared_ptr<TaskHandle> submit(std::function<void()> fn) {
    auto handle = std::make_shared<TaskHandle>();
    {
      std::lock_guard<std::mutex> lock(m_);
      queue_.push_back({std::move(fn), handle});
    }
    cv_.notify_all();
    return handle;
  }

  // Wait until all queued tasks completed.
  void drain() {
    std::shared_ptr<TaskHandle> last;
    {
      std::lock_guard<std::mutex> lock(m_);
      if (!queue_.empty()) last = queue_.back().handle;
    }
    if (last) last->wait();
    // the currently-running task (already popped) is covered by in_flight_
    std::shared_ptr<TaskHandle> running;
    {
      std::lock_guard<std::mutex> lock(m_);
      running = in_flight_;
    }
    if (running) running->wait();
  }

 private:
  struct Item {
    std::function<void()> fn;
    std::shared_ptr<TaskHandle> handle;
  };

  void run() {
    while (true) {
      Item item;
      {
        std::unique_lock<std::mutex> lock(m_);
        cv_.wait(lock, [this] { return !queue_.empty() || !running_; });
        if (!running_ && queue_.empty()) return;
        item = std::move(queue_.front());
        queue_.pop_front();
        in_flight_ = item.handle;
      }
      item.fn();
      item.handle->mark_done();
      {
        std::lock_guard<std::mutex> lock(m_);
        in_flight_.reset();
      }
    }
  }

  std::mutex m_;
  std::condition_variable cv_;
  std::deque<Item> queue_;
  std::shared_ptr<TaskHandle> in_flight_;
  std::thread worker_;
  bool running_ = false;
};

}  // namespace tde265
