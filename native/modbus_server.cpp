// Native Modbus/TCP data-plane server.
//
// The HIL serving plane of the framework: four register blocks (coils,
// discrete inputs, input registers, holding registers) served to external
// SCADA/PID clients over Modbus/TCP (MBAP framing, function codes
// 1/2/3/4/5/6/15/16 with standard exceptions).
//
// This is the C++ counterpart of the Python asyncio server in
// ics_wt_physicsengine_tpu/modbus/slave.py: a single poll()-driven thread
// serves all connections with microsecond-scale request handling, so dozens
// of polling SCADA masters never perturb the simulation loop's timing. The
// Python side owns the register *semantics* (names, encodings, validation);
// this library owns sockets and word storage only.
//
// C ABI (used from Python via ctypes — see modbus/native_slave.py):
//   mb_create(sizes[4])                 -> handle
//   mb_start(handle, host, port)        -> bound port (0 = ephemeral) or -1
//   mb_stop(handle)                     -> join server thread
//   mb_destroy(handle)
//   mb_get / mb_set(handle, block, addr, count, words) -> 0 / -1
//   mb_request_count / mb_error_count(handle)

#include <arpa/inet.h>
#include <array>
#include <atomic>
#include <cerrno>
#include <fcntl.h>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <string>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr size_t kMaxFrame = 300;  // MBAP(7) + max PDU (253)

enum Block { COILS = 0, DISCRETE_INPUTS = 1, INPUT_REGISTERS = 2,
             HOLDING_REGISTERS = 3 };

enum Fc : uint8_t {
  FC_READ_COILS = 0x01,
  FC_READ_DISCRETE_INPUTS = 0x02,
  FC_READ_HOLDING = 0x03,
  FC_READ_INPUT = 0x04,
  FC_WRITE_SINGLE_COIL = 0x05,
  FC_WRITE_SINGLE_REG = 0x06,
  FC_DIAGNOSTICS = 0x08,    // serial-line diagnostics sub-functions
  FC_WRITE_MULTI_COILS = 0x0F,
  FC_WRITE_MULTI_REGS = 0x10,
  FC_MASK_WRITE_REG = 0x16,   // Mask Write Register (FC 22)
  FC_READ_WRITE_MULTI = 0x17, // Read/Write Multiple Registers (FC 23)
  FC_ENCAPSULATED = 0x2B,   // MEI transport (FC 43)
};

// FC 08 sub-functions (Modbus spec 6.8). The reference's one explicitly
// listed protocol limitation is "No diagnostics counters (bad CRCs,
// timeouts)" (reference README.md:537) — both data planes here keep the
// standard counters and serve them over the wire.
enum DiagSub : uint16_t {
  DIAG_RETURN_QUERY_DATA = 0x0000,
  DIAG_CLEAR_COUNTERS = 0x000A,
  DIAG_BUS_MESSAGE_COUNT = 0x000B,
  DIAG_BUS_COMM_ERROR_COUNT = 0x000C,
  DIAG_BUS_EXCEPTION_COUNT = 0x000D,
  DIAG_SLAVE_MESSAGE_COUNT = 0x000E,
  DIAG_SLAVE_NO_RESPONSE_COUNT = 0x000F,
};

constexpr uint8_t kMeiReadDeviceId = 0x0E;

// Read Device Identification objects (Modbus spec 6.21); ids 0x00-0x02 are
// the "basic" set. Same strings as the Python server's device_info
// (slave.py) unless overridden via mb_set_identity.
struct DeviceIdObject {
  uint8_t id;
  std::string value;
};

enum Ex : uint8_t {
  EX_ILLEGAL_FUNCTION = 0x01,
  EX_ILLEGAL_ADDRESS = 0x02,
  EX_ILLEGAL_VALUE = 0x03,
};

struct Conn {
  int fd = -1;
  std::vector<uint8_t> buf;   // inbound bytes awaiting a complete frame
  std::vector<uint8_t> out;   // outbound bytes a non-blocking send deferred
};

constexpr size_t kMaxOutBuffer = 1 << 20;  // drop clients slower than this

using Bank = std::array<std::vector<uint16_t>, 4>;

struct Server {
  Bank blocks;                 // the primary unit's four register blocks
  // Extra Modbus units (fleet mode): unit id -> its own four blocks.
  // Mutated only before mb_start (mb_add_unit); read lock-free by the
  // server thread afterwards. Word access still goes through data_mutex.
  std::map<int, Bank> extra_units;
  std::mutex data_mutex;

  int listen_fd = -1;
  int wake_pipe[2] = {-1, -1};
  std::thread thread;
  // Written by the control thread, read by the server thread (and the
  // counters the other way around) — atomics, not plain fields.
  std::atomic<bool> running{false};
  uint16_t bound_port = 0;
  std::atomic<uint64_t> request_count{0};   // bus messages seen
  std::atomic<uint64_t> error_count{0};     // exception responses returned
  std::atomic<uint64_t> malformed_count{0};  // broken MBAP framing (the
                                             // TCP analogue of a bad CRC)
  std::atomic<uint64_t> slave_message_count{0};   // addressed to us
  std::atomic<uint64_t> no_response_count{0};     // other units' traffic
  // -1 = answer any unit id (default); otherwise answer only this unit
  // or the 0xFF "any" convention used over TCP.
  std::atomic<int> unit_id{-1};
  // Runtime connection cap (mb_set_max_clients): defaults to the historic
  // compile-time 64; the 1000-client load target (reference README.md:455)
  // needs it fleet-/load-test-sized. poll()-based, so no FD_SETSIZE limit.
  std::atomic<int> max_clients{64};
  std::vector<DeviceIdObject> device_id{
      {0x00, "ICS-WT-PhysicsEngine-TPU"},
      {0x01, "WTS-TPU"},
      {0x02, "1.0"},
      {0x04, "Water Treatment Simulator (TPU)"},
      {0x05, "CSTR-MultiZone"},
  };

  // unit < 0 or == the served unit id -> primary bank; otherwise a
  // registered extra unit's bank, or nullptr when the id is not served.
  Bank* bank_for(int unit) {
    if (unit < 0 || unit == 0xFF ||
        unit == unit_id.load(std::memory_order_relaxed))
      return &blocks;
    auto it = extra_units.find(unit);
    return it == extra_units.end() ? nullptr : &it->second;
  }

  bool get(Bank& bank, int block, size_t addr, size_t count, uint16_t* out) {
    if (block < 0 || block > 3) return false;
    std::lock_guard<std::mutex> lock(data_mutex);
    auto& b = bank[block];
    if (addr + count > b.size()) return false;
    std::memcpy(out, b.data() + addr, count * sizeof(uint16_t));
    return true;
  }

  bool set(Bank& bank, int block, size_t addr, size_t count,
           const uint16_t* in) {
    if (block < 0 || block > 3) return false;
    std::lock_guard<std::mutex> lock(data_mutex);
    auto& b = bank[block];
    if (addr + count > b.size()) return false;
    std::memcpy(b.data() + addr, in, count * sizeof(uint16_t));
    return true;
  }

  // Build the response PDU for a request PDU. Returns response length.
  size_t process_pdu(Bank& bank, const uint8_t* pdu, size_t len,
                     uint8_t* resp) {
    if (len < 1) return 0;
    uint8_t fc = pdu[0];
    auto exception = [&](uint8_t code) -> size_t {
      resp[0] = fc | 0x80;
      resp[1] = code;
      error_count++;
      return 2;
    };
    switch (fc) {
      case FC_READ_COILS: case FC_READ_DISCRETE_INPUTS:
      case FC_READ_HOLDING: case FC_READ_INPUT:
      case FC_WRITE_SINGLE_COIL: case FC_WRITE_SINGLE_REG:
      case FC_WRITE_MULTI_COILS: case FC_WRITE_MULTI_REGS:
      case FC_MASK_WRITE_REG: case FC_READ_WRITE_MULTI:
      case FC_DIAGNOSTICS:
        break;
      case FC_ENCAPSULATED: {
        // FC 43 / MEI 14: Read Device Identification.
        if (len < 4 || pdu[1] != kMeiReadDeviceId)
          return exception(EX_ILLEGAL_FUNCTION);
        uint8_t read_code = pdu[2], object_id = pdu[3];
        std::vector<const DeviceIdObject*> objs;
        if (read_code == 0x01) {            // basic: ids 0x00-0x02
          for (const auto& o : device_id)
            if (o.id <= 0x02 && o.id >= object_id) objs.push_back(&o);
          if (objs.empty())
            for (const auto& o : device_id)
              if (o.id <= 0x02) objs.push_back(&o);
        } else if (read_code == 0x02 || read_code == 0x03) {
          for (const auto& o : device_id)
            if (o.id >= object_id) objs.push_back(&o);
          if (objs.empty())
            for (const auto& o : device_id) objs.push_back(&o);
        } else if (read_code == 0x04) {     // one specific object
          for (const auto& o : device_id)
            if (o.id == object_id) objs.push_back(&o);
          if (objs.empty()) return exception(EX_ILLEGAL_ADDRESS);
        } else {
          return exception(EX_ILLEGAL_VALUE);
        }
        size_t n = 7;
        resp[0] = fc;
        resp[1] = kMeiReadDeviceId;
        resp[2] = read_code;
        resp[3] = 0x82;   // regular identification, stream + individual
        resp[4] = 0x00;   // no MoreFollows
        resp[5] = 0x00;   // next object id
        resp[6] = static_cast<uint8_t>(objs.size());
        for (const auto* o : objs) {
          if (n + 2 + o->value.size() > kMaxFrame - 7)
            return exception(EX_ILLEGAL_VALUE);
          resp[n++] = o->id;
          resp[n++] = static_cast<uint8_t>(o->value.size());
          std::memcpy(resp + n, o->value.data(), o->value.size());
          n += o->value.size();
        }
        return n;
      }
      default:
        return exception(EX_ILLEGAL_FUNCTION);
    }
    if (len < 5) return exception(EX_ILLEGAL_VALUE);
    uint16_t address = (pdu[1] << 8) | pdu[2];
    uint16_t count_or_value = (pdu[3] << 8) | pdu[4];

    if (fc == FC_DIAGNOSTICS) {
      // address = sub-function, count_or_value = data field.
      auto counter16 = [&](uint64_t v) -> size_t {
        resp[0] = fc;
        resp[1] = static_cast<uint8_t>(address >> 8);
        resp[2] = static_cast<uint8_t>(address & 0xFF);
        resp[3] = static_cast<uint8_t>((v & 0xFFFF) >> 8);
        resp[4] = static_cast<uint8_t>(v & 0xFFFF);
        return 5;
      };
      switch (address) {
        case DIAG_RETURN_QUERY_DATA:
          std::memcpy(resp, pdu, 5);
          return 5;
        case DIAG_CLEAR_COUNTERS:
          request_count = 0;
          error_count = 0;
          malformed_count = 0;
          slave_message_count = 0;
          no_response_count = 0;
          std::memcpy(resp, pdu, 5);
          return 5;
        case DIAG_BUS_MESSAGE_COUNT:
          return counter16(request_count.load());
        case DIAG_BUS_COMM_ERROR_COUNT:
          return counter16(malformed_count.load());
        case DIAG_BUS_EXCEPTION_COUNT:
          return counter16(error_count.load());
        case DIAG_SLAVE_MESSAGE_COUNT:
          return counter16(slave_message_count.load());
        case DIAG_SLAVE_NO_RESPONSE_COUNT:
          return counter16(no_response_count.load());
        default:
          return exception(EX_ILLEGAL_FUNCTION);
      }
    }

    switch (fc) {
      case FC_READ_COILS:
      case FC_READ_DISCRETE_INPUTS: {
        int block = (fc == FC_READ_COILS) ? COILS : DISCRETE_INPUTS;
        uint16_t count = count_or_value;
        if (count < 1 || count > 2000) return exception(EX_ILLEGAL_VALUE);
        std::vector<uint16_t> bits(count);
        if (!get(bank, block, address, count, bits.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        uint8_t n_bytes = (count + 7) / 8;
        resp[0] = fc;
        resp[1] = n_bytes;
        std::memset(resp + 2, 0, n_bytes);
        for (uint16_t i = 0; i < count; i++)
          if (bits[i]) resp[2 + i / 8] |= 1 << (i % 8);
        return 2 + n_bytes;
      }
      case FC_READ_HOLDING:
      case FC_READ_INPUT: {
        int block = (fc == FC_READ_HOLDING) ? HOLDING_REGISTERS
                                            : INPUT_REGISTERS;
        uint16_t count = count_or_value;
        if (count < 1 || count > 125) return exception(EX_ILLEGAL_VALUE);
        std::vector<uint16_t> words(count);
        if (!get(bank, block, address, count, words.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        resp[0] = fc;
        resp[1] = count * 2;
        for (uint16_t i = 0; i < count; i++) {
          resp[2 + 2 * i] = words[i] >> 8;
          resp[3 + 2 * i] = words[i] & 0xFF;
        }
        return 2 + count * 2;
      }
      case FC_WRITE_SINGLE_COIL: {
        if (count_or_value != 0x0000 && count_or_value != 0xFF00)
          return exception(EX_ILLEGAL_VALUE);
        uint16_t bit = count_or_value ? 1 : 0;
        if (!set(bank, COILS, address, 1, &bit))
          return exception(EX_ILLEGAL_ADDRESS);
        std::memcpy(resp, pdu, 5);
        return 5;
      }
      case FC_WRITE_SINGLE_REG: {
        if (!set(bank, HOLDING_REGISTERS, address, 1, &count_or_value))
          return exception(EX_ILLEGAL_ADDRESS);
        std::memcpy(resp, pdu, 5);
        return 5;
      }
      case FC_WRITE_MULTI_COILS: {
        if (len < 6) return exception(EX_ILLEGAL_VALUE);
        uint16_t count = count_or_value;
        uint8_t n_bytes = pdu[5];
        if (count < 1 || count > 0x07B0 || len < 6u + n_bytes ||
            n_bytes != (count + 7) / 8)
          return exception(EX_ILLEGAL_VALUE);
        std::vector<uint16_t> bits(count);
        for (uint16_t i = 0; i < count; i++)
          bits[i] = (pdu[6 + i / 8] >> (i % 8)) & 1;
        if (!set(bank, COILS, address, count, bits.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        std::memcpy(resp, pdu, 5);
        return 5;
      }
      case FC_WRITE_MULTI_REGS: {
        if (len < 6) return exception(EX_ILLEGAL_VALUE);
        uint16_t count = count_or_value;
        uint8_t n_bytes = pdu[5];
        if (count < 1 || count > 123 || n_bytes != count * 2 ||
            len < 6u + n_bytes)
          return exception(EX_ILLEGAL_VALUE);
        std::vector<uint16_t> words(count);
        for (uint16_t i = 0; i < count; i++)
          words[i] = (pdu[6 + 2 * i] << 8) | pdu[7 + 2 * i];
        if (!set(bank, HOLDING_REGISTERS, address, count, words.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        std::memcpy(resp, pdu, 5);
        return 5;
      }
      case FC_MASK_WRITE_REG: {
        // Modbus spec 6.16: reg = (current & and_mask) | (or_mask &
        // ~and_mask); response echoes the request.
        if (len < 7) return exception(EX_ILLEGAL_VALUE);
        uint16_t and_mask = count_or_value;           // bytes 3-4
        uint16_t or_mask = (pdu[5] << 8) | pdu[6];
        uint16_t current;
        if (!get(bank, HOLDING_REGISTERS, address, 1, &current))
          return exception(EX_ILLEGAL_ADDRESS);
        uint16_t out = static_cast<uint16_t>(
            (current & and_mask) | (or_mask & ~and_mask));
        if (!set(bank, HOLDING_REGISTERS, address, 1, &out))
          return exception(EX_ILLEGAL_ADDRESS);
        std::memcpy(resp, pdu, 7);
        return 7;
      }
      case FC_READ_WRITE_MULTI: {
        // Modbus spec 6.17: the WRITE executes first, then the read;
        // response is FC3-shaped over the read range.
        if (len < 10) return exception(EX_ILLEGAL_VALUE);
        uint16_t r_addr = address;                    // bytes 1-2
        uint16_t r_count = count_or_value;            // bytes 3-4
        uint16_t w_addr = (pdu[5] << 8) | pdu[6];
        uint16_t w_count = (pdu[7] << 8) | pdu[8];
        uint8_t n_bytes = pdu[9];
        if (r_count < 1 || r_count > 125 || w_count < 1 ||
            w_count > 121 || n_bytes != w_count * 2 ||
            len < 10u + n_bytes)
          return exception(EX_ILLEGAL_VALUE);
        std::vector<uint16_t> w(w_count);
        for (uint16_t i = 0; i < w_count; i++)
          w[i] = (pdu[10 + 2 * i] << 8) | pdu[11 + 2 * i];
        if (!set(bank, HOLDING_REGISTERS, w_addr, w_count, w.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        std::vector<uint16_t> r(r_count);
        if (!get(bank, HOLDING_REGISTERS, r_addr, r_count, r.data()))
          return exception(EX_ILLEGAL_ADDRESS);
        resp[0] = fc;
        resp[1] = static_cast<uint8_t>(r_count * 2);
        for (uint16_t i = 0; i < r_count; i++) {
          resp[2 + 2 * i] = r[i] >> 8;
          resp[3 + 2 * i] = r[i] & 0xFF;
        }
        return 2 + r_count * 2;
      }
      default:
        return exception(EX_ILLEGAL_FUNCTION);
    }
  }

  // Flush a connection's deferred output. Returns false on a hard send
  // error; EAGAIN leaves the remainder buffered for the next POLLOUT.
  bool flush(Conn& conn) {
    while (!conn.out.empty()) {
      ssize_t n = ::send(conn.fd, conn.out.data(), conn.out.size(),
                         MSG_NOSIGNAL);
      if (n < 0)
        return errno == EAGAIN || errno == EWOULDBLOCK;
      if (n == 0) return false;
      conn.out.erase(conn.out.begin(), conn.out.begin() + n);
    }
    return true;
  }

  // Consume complete MBAP frames from a connection buffer. Responses go
  // out via non-blocking send; bytes the kernel won't take are buffered
  // per connection (flushed on POLLOUT) so one stalled client can never
  // block the poll thread and freeze the other masters. Returns false on
  // protocol garbage or a client slower than kMaxOutBuffer.
  bool drain(Conn& conn) {
    while (conn.buf.size() >= 7) {
      uint16_t proto = (conn.buf[2] << 8) | conn.buf[3];
      uint16_t length = (conn.buf[4] << 8) | conn.buf[5];
      if (proto != 0 || length < 2 || length > 254) {
        malformed_count++;
        return false;
      }
      size_t frame = 6u + length;
      if (conn.buf.size() < frame) return true;  // wait for more bytes

      uint8_t unit = conn.buf[6];
      int served_unit = unit_id.load(std::memory_order_relaxed);
      Bank* bank = nullptr;
      if (unit == 0xFF || served_unit < 0 || unit == served_unit) {
        bank = &blocks;                     // primary (0xFF = broadcast)
      } else {
        auto it = extra_units.find(unit);   // fleet unit?
        if (it != extra_units.end()) bank = &it->second;
      }
      if (bank == nullptr) {
        // not addressed to a unit this slave serves: consume, send nothing
        request_count++;
        no_response_count++;
        conn.buf.erase(conn.buf.begin(), conn.buf.begin() + frame);
        continue;
      }

      uint8_t resp[kMaxFrame];
      // copy MBAP header (transaction + protocol + unit)
      std::memcpy(resp, conn.buf.data(), 7);
      size_t resp_pdu = process_pdu(*bank, conn.buf.data() + 7, length - 1,
                                    resp + 7);
      request_count++;
      slave_message_count++;
      uint16_t resp_len = static_cast<uint16_t>(resp_pdu + 1);
      resp[4] = resp_len >> 8;
      resp[5] = resp_len & 0xFF;
      size_t total = 7 + resp_pdu;
      conn.out.insert(conn.out.end(), resp, resp + total);
      if (!flush(conn) || conn.out.size() > kMaxOutBuffer) return false;
      conn.buf.erase(conn.buf.begin(), conn.buf.begin() + frame);
    }
    return true;
  }

  void run() {
    std::vector<Conn> conns;
    while (running.load(std::memory_order_relaxed)) {
      std::vector<pollfd> fds;
      fds.push_back({wake_pipe[0], POLLIN, 0});
      fds.push_back({listen_fd, POLLIN, 0});
      for (auto& conn : conns)
        fds.push_back({conn.fd,
                       static_cast<short>(POLLIN |
                                          (conn.out.empty() ? 0 : POLLOUT)),
                       0});

      if (::poll(fds.data(), fds.size(), 500) < 0) {
        if (errno == EINTR) continue;
        break;
      }
      if (fds[0].revents & POLLIN) break;  // stop requested

      // Only connections that were present when poll() was armed have a
      // pollfd entry; anything accepted below is served next iteration.
      size_t n_polled = conns.size();

      if (fds[1].revents & POLLIN) {
        // drain the accept queue (several masters may connect in a burst)
        for (;;) {
          int fd = ::accept(listen_fd, nullptr, nullptr);
          if (fd < 0) break;
          if ((int)conns.size() >= max_clients.load()) {
            ::close(fd);
          } else {
            int one = 1;
            ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
            // O_NONBLOCK is not inherited from the listener: set it so a
            // client that stops reading can never stall the poll thread.
            int cflags = ::fcntl(fd, F_GETFL, 0);
            ::fcntl(fd, F_SETFL, cflags | O_NONBLOCK);
            conns.push_back({fd, {}, {}});
          }
        }
      }

      for (size_t i = 0; i < n_polled;) {
        auto& conn = conns[i];
        pollfd& pfd = fds[2 + i];
        bool drop = false;
        if (pfd.revents & POLLOUT) {
          if (!flush(conn)) drop = true;
        }
        if (!drop && (pfd.revents & (POLLIN | POLLHUP | POLLERR))) {
          uint8_t chunk[4096];
          ssize_t n = ::recv(conn.fd, chunk, sizeof(chunk), 0);
          if (n < 0) {
            drop = !(errno == EAGAIN || errno == EWOULDBLOCK);
          } else if (n == 0) {
            drop = true;
          } else {
            conn.buf.insert(conn.buf.end(), chunk, chunk + n);
            if (conn.buf.size() > 16 * kMaxFrame || !drain(conn))
              drop = true;  // oversized garbage, protocol violation, or
                            // a client slower than kMaxOutBuffer
          }
        }
        if (drop) {
          ::close(conn.fd);
          conns.erase(conns.begin() + i);
          fds.erase(fds.begin() + 2 + i);
          n_polled--;
        } else {
          i++;
        }
      }
    }
    for (auto& conn : conns) ::close(conn.fd);
  }
};

}  // namespace

extern "C" {

void mb_set_max_clients(void* handle, int n) {
  auto* s = static_cast<Server*>(handle);
  if (n > 0) s->max_clients.store(n);
}

void* mb_create(const uint32_t sizes[4]) {
  auto* s = new Server();
  for (int i = 0; i < 4; i++) s->blocks[i].assign(sizes[i], 0);
  return s;
}

// Register an extra Modbus unit id (fleet mode) with its own four blocks,
// sized like the primary's. Call before mb_start. Returns 0, or -1 if the
// server is already running or the id is invalid/duplicate.
int mb_add_unit(void* handle, int unit) {
  auto* s = static_cast<Server*>(handle);
  if (s->running || unit < 0 || unit > 0xFE ||
      unit == s->unit_id.load() || s->extra_units.count(unit))
    return -1;
  Bank bank;
  for (int i = 0; i < 4; i++) bank[i].assign(s->blocks[i].size(), 0);
  s->extra_units.emplace(unit, std::move(bank));
  return 0;
}

// Returns the bound port, or -1 on failure.
int mb_start(void* handle, const char* host, uint16_t port) {
  auto* s = static_cast<Server*>(handle);
  if (s->running) return -1;

  s->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (s->listen_fd < 0) return -1;
  int one = 1;
  ::setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));

  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    ::close(s->listen_fd);
    return -1;
  }
  // non-blocking listener: the poll loop accept-drains without stalling
  int flags = ::fcntl(s->listen_fd, F_GETFL, 0);
  ::fcntl(s->listen_fd, F_SETFL, flags | O_NONBLOCK);
  if (::bind(s->listen_fd, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) < 0 ||
      ::listen(s->listen_fd, 1024) < 0) {
    ::close(s->listen_fd);
    return -1;
  }
  socklen_t alen = sizeof(addr);
  ::getsockname(s->listen_fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  s->bound_port = ntohs(addr.sin_port);

  if (::pipe(s->wake_pipe) < 0) {
    ::close(s->listen_fd);
    return -1;
  }
  s->running = true;
  s->thread = std::thread([s] { s->run(); });
  return s->bound_port;
}

void mb_stop(void* handle) {
  auto* s = static_cast<Server*>(handle);
  if (!s->running) return;
  s->running = false;
  char byte = 1;
  ssize_t ignored = ::write(s->wake_pipe[1], &byte, 1);
  (void)ignored;
  if (s->thread.joinable()) s->thread.join();
  ::close(s->listen_fd);
  ::close(s->wake_pipe[0]);
  ::close(s->wake_pipe[1]);
  s->listen_fd = -1;
}

void mb_destroy(void* handle) {
  auto* s = static_cast<Server*>(handle);
  mb_stop(s);
  delete s;
}

int mb_get(void* handle, int block, uint32_t addr, uint32_t count,
           uint16_t* out) {
  auto* s = static_cast<Server*>(handle);
  return s->get(s->blocks, block, addr, count, out) ? 0 : -1;
}

int mb_set(void* handle, int block, uint32_t addr, uint32_t count,
           const uint16_t* in) {
  auto* s = static_cast<Server*>(handle);
  return s->set(s->blocks, block, addr, count, in) ? 0 : -1;
}

// unit-addressed variants (fleet mode); unit < 0 = primary.
int mb_get_unit(void* handle, int unit, int block, uint32_t addr,
                uint32_t count, uint16_t* out) {
  auto* s = static_cast<Server*>(handle);
  Bank* bank = s->bank_for(unit);
  return bank && s->get(*bank, block, addr, count, out) ? 0 : -1;
}

int mb_set_unit(void* handle, int unit, int block, uint32_t addr,
                uint32_t count, const uint16_t* in) {
  auto* s = static_cast<Server*>(handle);
  Bank* bank = s->bank_for(unit);
  return bank && s->set(*bank, block, addr, count, in) ? 0 : -1;
}

uint64_t mb_request_count(void* handle) {
  return static_cast<Server*>(handle)->request_count.load();
}

// The five FC 08 diagnostic counters in sub-function order 0x0B..0x0F:
// bus messages, comm errors (malformed frames), exception responses,
// slave messages, no-response (other-unit) messages.
void mb_diag_counters(void* handle, uint64_t out[5]) {
  auto* s = static_cast<Server*>(handle);
  out[0] = s->request_count.load();
  out[1] = s->malformed_count.load();
  out[2] = s->error_count.load();
  out[3] = s->slave_message_count.load();
  out[4] = s->no_response_count.load();
}

uint64_t mb_error_count(void* handle) {
  return static_cast<Server*>(handle)->error_count.load();
}

// unit >= 0: answer only that unit id (or 0xFF); unit < 0: answer any.
void mb_set_unit_id(void* handle, int unit) {
  static_cast<Server*>(handle)->unit_id.store(unit);
}

// Replace one device-identification object (FC 43 / MEI 14). Call before
// mb_start — the vector is not guarded against the server thread.
void mb_set_identity(void* handle, uint8_t object_id, const char* value) {
  auto* s = static_cast<Server*>(handle);
  for (auto& o : s->device_id)
    if (o.id == object_id) { o.value = value; return; }
  s->device_id.push_back({object_id, value});
}

}  // extern "C"
