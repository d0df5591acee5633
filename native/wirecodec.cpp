// Native wire codec for covins_tpu.
//
// C++ implementation of the length-framed binary record format defined in
// covins_tpu/comm/wire.py (byte-identical), playing the role the cereal +
// framed-TCP C++ layer plays in the reference (covins_comm/src/covins_base/
// communicator_base.cpp): the serialization hot path of the agent plane.
//
// Exposed as a plain C API consumed via ctypes (no pybind11 in this image):
//   - cvns_encode_record : pack a field table into the record layout
//   - cvns_count_fields / cvns_decode_record : zero-copy parse (pointers
//     into the caller's buffer)
//   - cvns_stream_*      : incremental frame reassembler for raw socket
//     bytes (header parse + payload slicing), replacing the reference's
//     RecvMsg/RecvAll loop (communicator_base.cpp:276-315,404-430).
//
// Record layout (little endian):
//   n_fields u16, then per field:
//   name_len u16 | name | kind u8 (0=array,1=str,2=none)
//   [array]  dtype_len u8 | dtype | ndim u8 | shape i64*ndim | raw data
//   [str]    len u32 | utf8
// Frame header: magic u32 'CVNS' | version u8 | msg_type u8 | res u16 |
//               payload_len u64

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x43564E53;
constexpr uint8_t kVersion = 1;
constexpr size_t kHeaderSize = 4 + 1 + 1 + 2 + 8;

inline void put_u16(uint8_t*& p, uint16_t v) { std::memcpy(p, &v, 2); p += 2; }
inline void put_u32(uint8_t*& p, uint32_t v) { std::memcpy(p, &v, 4); p += 4; }
inline void put_u64(uint8_t*& p, uint64_t v) { std::memcpy(p, &v, 8); p += 8; }
inline void put_i64(uint8_t*& p, int64_t v) { std::memcpy(p, &v, 8); p += 8; }
inline void put_u8(uint8_t*& p, uint8_t v) { *p++ = v; }

inline bool get_u16(const uint8_t*& p, const uint8_t* end, uint16_t* v) {
  if (end - p < 2) return false;
  std::memcpy(v, p, 2); p += 2; return true;
}
inline bool get_u32(const uint8_t*& p, const uint8_t* end, uint32_t* v) {
  if (end - p < 4) return false;
  std::memcpy(v, p, 4); p += 4; return true;
}
inline bool get_i64(const uint8_t*& p, const uint8_t* end, int64_t* v) {
  if (end - p < 8) return false;
  std::memcpy(v, p, 8); p += 8; return true;
}
inline bool get_u8(const uint8_t*& p, const uint8_t* end, uint8_t* v) {
  if (end - p < 1) return false;
  *v = *p++; return true;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// encode
// ---------------------------------------------------------------------------

// Returns bytes written, or -1 if out_cap is insufficient.
// shapes_flat: concatenation of each field's shape (ndims[i] entries each).
int64_t cvns_encode_record(
    int32_t n_fields,
    const char* const* names, const uint16_t* name_lens,
    const uint8_t* kinds,
    const char* const* dtypes, const uint8_t* dtype_lens,
    const uint8_t* ndims, const int64_t* shapes_flat,
    const void* const* data, const int64_t* data_lens,
    uint8_t* out, int64_t out_cap) {
  // first pass: size
  int64_t need = 2;
  int shape_off = 0;
  for (int i = 0; i < n_fields; ++i) {
    need += 2 + name_lens[i] + 1;
    if (kinds[i] == 0) {
      need += 1 + dtype_lens[i] + 1 + 8LL * ndims[i] + data_lens[i];
    } else if (kinds[i] == 1) {
      need += 4 + data_lens[i];
    }
    shape_off += ndims[i];
  }
  if (need > out_cap) return -1;

  uint8_t* p = out;
  put_u16(p, static_cast<uint16_t>(n_fields));
  shape_off = 0;
  for (int i = 0; i < n_fields; ++i) {
    put_u16(p, name_lens[i]);
    std::memcpy(p, names[i], name_lens[i]); p += name_lens[i];
    put_u8(p, kinds[i]);
    if (kinds[i] == 0) {
      put_u8(p, dtype_lens[i]);
      std::memcpy(p, dtypes[i], dtype_lens[i]); p += dtype_lens[i];
      put_u8(p, ndims[i]);
      for (int d = 0; d < ndims[i]; ++d) put_i64(p, shapes_flat[shape_off + d]);
      std::memcpy(p, data[i], data_lens[i]); p += data_lens[i];
    } else if (kinds[i] == 1) {
      put_u32(p, static_cast<uint32_t>(data_lens[i]));
      std::memcpy(p, data[i], data_lens[i]); p += data_lens[i];
    }
    shape_off += ndims[i];
  }
  return p - out;
}

// ---------------------------------------------------------------------------
// decode (zero-copy: emits offsets into the input buffer)
// ---------------------------------------------------------------------------

int32_t cvns_count_fields(const uint8_t* buf, int64_t len) {
  if (len < 2) return -1;
  uint16_t n;
  std::memcpy(&n, buf, 2);
  return n;
}

// Fills per-field tables; *_off are byte offsets into `buf`.
// Returns 0 on success, negative on malformed input / capacity overflow.
int32_t cvns_decode_record(
    const uint8_t* buf, int64_t len,
    int32_t n_fields_cap, int64_t shapes_cap,
    int64_t* name_offs, uint16_t* name_lens,
    uint8_t* kinds,
    int64_t* dtype_offs, uint8_t* dtype_lens,
    uint8_t* ndims, int64_t* shapes_flat,
    int64_t* data_offs, int64_t* data_lens) {
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint16_t n_fields;
  if (!get_u16(p, end, &n_fields)) return -1;
  if (n_fields > n_fields_cap) return -2;
  int64_t shape_off = 0;
  for (int i = 0; i < n_fields; ++i) {
    uint16_t nlen;
    if (!get_u16(p, end, &nlen)) return -1;
    if (end - p < nlen) return -1;
    name_offs[i] = p - buf; name_lens[i] = nlen; p += nlen;
    uint8_t kind;
    if (!get_u8(p, end, &kind)) return -1;
    kinds[i] = kind;
    if (kind == 2) {  // none
      ndims[i] = 0; dtype_offs[i] = 0; dtype_lens[i] = 0;
      data_offs[i] = 0; data_lens[i] = 0;
      continue;
    }
    if (kind == 1) {  // str
      uint32_t slen;
      if (!get_u32(p, end, &slen)) return -1;
      if (end - p < slen) return -1;
      data_offs[i] = p - buf; data_lens[i] = slen; p += slen;
      ndims[i] = 0; dtype_offs[i] = 0; dtype_lens[i] = 0;
      continue;
    }
    // array
    uint8_t dlen;
    if (!get_u8(p, end, &dlen)) return -1;
    if (end - p < dlen) return -1;
    dtype_offs[i] = p - buf; dtype_lens[i] = dlen; p += dlen;
    uint8_t nd;
    if (!get_u8(p, end, &nd)) return -1;
    ndims[i] = nd;
    if (shape_off + nd > shapes_cap) return -3;
    int64_t count = 1;
    for (int d = 0; d < nd; ++d) {
      int64_t s;
      if (!get_i64(p, end, &s)) return -1;
      shapes_flat[shape_off + d] = s;
      count *= s;
    }
    shape_off += nd;
    // itemsize from the dtype string tail (e.g. "<f8" -> 8, "<u1" -> 1,
    // "<c16" -> 16)
    int64_t itemsize = 0;
    for (int c = 1; c < dlen; ++c) {
      char ch = reinterpret_cast<const char*>(buf)[dtype_offs[i] + c];
      if (ch >= '0' && ch <= '9') itemsize = itemsize * 10 + (ch - '0');
    }
    if (itemsize <= 0) return -4;
    int64_t nbytes = count * itemsize;
    if (end - p < nbytes) return -1;
    data_offs[i] = p - buf; data_lens[i] = nbytes; p += nbytes;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// frame reassembler (socket byte stream -> complete frames)
// ---------------------------------------------------------------------------

struct CvnsStream {
  std::vector<uint8_t> buf;
  size_t read_pos = 0;
};

void* cvns_stream_new() { return new CvnsStream(); }

void cvns_stream_free(void* s) { delete static_cast<CvnsStream*>(s); }

// Append raw bytes from the socket.
void cvns_stream_feed(void* sv, const uint8_t* data, int64_t len) {
  auto* s = static_cast<CvnsStream*>(sv);
  // compact consumed prefix occasionally
  if (s->read_pos > (1 << 20) && s->read_pos * 2 > s->buf.size()) {
    s->buf.erase(s->buf.begin(), s->buf.begin() + s->read_pos);
    s->read_pos = 0;
  }
  s->buf.insert(s->buf.end(), data, data + len);
}

// If a complete frame is buffered: sets msg_type + payload offset/len
// (offsets valid until the next feed/compact) and returns 1; else 0.
// Returns -1 on protocol error (bad magic/version).
int32_t cvns_stream_next(void* sv, uint8_t* msg_type,
                         int64_t* payload_off, int64_t* payload_len) {
  auto* s = static_cast<CvnsStream*>(sv);
  size_t avail = s->buf.size() - s->read_pos;
  if (avail < kHeaderSize) return 0;
  const uint8_t* h = s->buf.data() + s->read_pos;
  uint32_t magic;
  std::memcpy(&magic, h, 4);
  if (magic != kMagic) return -1;
  if (h[4] != kVersion) return -1;
  uint64_t plen;
  std::memcpy(&plen, h + 8, 8);
  if (avail < kHeaderSize + plen) return 0;
  *msg_type = h[5];
  *payload_off = static_cast<int64_t>(s->read_pos + kHeaderSize);
  *payload_len = static_cast<int64_t>(plen);
  s->read_pos += kHeaderSize + plen;
  return 1;
}

// Base pointer of the stream's internal buffer (for zero-copy slicing).
const uint8_t* cvns_stream_base(void* sv) {
  return static_cast<CvnsStream*>(sv)->buf.data();
}

}  // extern "C"
