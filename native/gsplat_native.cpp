// gsplat_tpu native host runtime: data loaders (PLY + COLMAP) and packers.
//
// TPU-native counterpart of the reference's C++ host-side IO layer — the
// streaming PLY parser/packer of GS-IRON (`GS-IRON/npu-1/loader.cpp:10-185`)
// and the COLMAP binary readers (`scene/colmap_loader.py:125-294`, which the
// Python stack re-parses on every scene load). Re-designed for this stack:
// instead of packing an AIE shim-DMA interleave, the loaders emit flat
// structure-of-arrays float32 buffers ready to be wrapped zero-copy by numpy
// and shipped to TPU HBM.
//
// Exposed as a plain C ABI (ctypes-friendly; pybind11 is not in this image).
// Build: see native/Makefile -> libgsplat_native.so.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// small utilities
// ---------------------------------------------------------------------------

struct Buffer {
  std::vector<uint8_t> data;
  bool ok = false;
};

Buffer read_file(const char* path) {
  Buffer b;
  FILE* f = std::fopen(path, "rb");
  if (!f) return b;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  b.data.resize(static_cast<size_t>(size));
  b.ok = std::fread(b.data.data(), 1, b.data.size(), f) == b.data.size();
  std::fclose(f);
  return b;
}

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

// PLY scalar type descriptor
struct PlyType {
  uint8_t size;
  char kind;  // 'f' float, 'i' int, 'u' uint
};

bool ply_type(const std::string& name, PlyType* out) {
  if (name == "float" || name == "float32") { *out = {4, 'f'}; return true; }
  if (name == "double" || name == "float64") { *out = {8, 'f'}; return true; }
  if (name == "char" || name == "int8") { *out = {1, 'i'}; return true; }
  if (name == "uchar" || name == "uint8") { *out = {1, 'u'}; return true; }
  if (name == "short" || name == "int16") { *out = {2, 'i'}; return true; }
  if (name == "ushort" || name == "uint16") { *out = {2, 'u'}; return true; }
  if (name == "int" || name == "int32") { *out = {4, 'i'}; return true; }
  if (name == "uint" || name == "uint32") { *out = {4, 'u'}; return true; }
  return false;
}

float convert_to_f32(const uint8_t* p, PlyType t) {
  switch (t.kind) {
    case 'f':
      if (t.size == 4) { float v; std::memcpy(&v, p, 4); return v; }
      else { double v; std::memcpy(&v, p, 8); return static_cast<float>(v); }
    case 'i':
      if (t.size == 1) return static_cast<float>(*reinterpret_cast<const int8_t*>(p));
      if (t.size == 2) { int16_t v; std::memcpy(&v, p, 2); return v; }
      { int32_t v; std::memcpy(&v, p, 4); return static_cast<float>(v); }
    default:
      if (t.size == 1) return static_cast<float>(*p);
      if (t.size == 2) { uint16_t v; std::memcpy(&v, p, 2); return v; }
      { uint32_t v; std::memcpy(&v, p, 4); return static_cast<float>(v); }
  }
}

}  // namespace

extern "C" {

const char* gsplat_last_error() { return g_error.c_str(); }

// ---------------------------------------------------------------------------
// PLY reader
//
// Parses the vertex element of a binary_little_endian PLY and converts every
// property to float32, column-major-by-property into `out` (n_props arrays of
// n_vertices floats, concatenated). Two-call protocol:
//   1) out == null: returns 0 on success, fills *n_vertices / *n_props and
//      writes the property names (comma-joined) into name_buf.
//   2) out != null: fills out[n_props * n_vertices].
// ---------------------------------------------------------------------------

int gsplat_ply_read(const char* path, int64_t* n_vertices, int32_t* n_props,
                    char* name_buf, int64_t name_buf_len, float* out) {
  Buffer buf = read_file(path);
  if (!buf.ok) { set_error(std::string("cannot read ") + path); return -1; }
  const std::string header_end = "end_header\n";
  std::string head(reinterpret_cast<char*>(buf.data.data()),
                   std::min<size_t>(buf.data.size(), 65536));
  size_t he = head.find(header_end);
  if (he == std::string::npos) { set_error("no end_header"); return -1; }
  std::string header = head.substr(0, he);
  size_t body_off = he + header_end.size();

  if (header.rfind("ply", 0) != 0) { set_error("missing ply magic"); return -1; }
  bool binary_le = header.find("format binary_little_endian") != std::string::npos;
  if (!binary_le) { set_error("only binary_little_endian supported natively"); return -1; }

  // parse elements; only "vertex" is materialized
  int64_t n_vert = 0;
  std::vector<std::pair<std::string, PlyType>> props;
  bool in_vertex = false;
  size_t pos = 0;
  while (pos < header.size()) {
    size_t eol = header.find('\n', pos);
    if (eol == std::string::npos) eol = header.size();
    std::string line = header.substr(pos, eol - pos);
    pos = eol + 1;
    if (line.rfind("element ", 0) == 0) {
      char name[64];
      long long cnt;
      if (std::sscanf(line.c_str(), "element %63s %lld", name, &cnt) == 2) {
        in_vertex = std::strcmp(name, "vertex") == 0;
        if (in_vertex) n_vert = cnt;
        else if (n_vert > 0) break;  // vertex parsed; later elements ignored
      }
    } else if (line.rfind("property ", 0) == 0 && in_vertex) {
      char type_s[32], prop_s[64];
      if (std::sscanf(line.c_str(), "property %31s %63s", type_s, prop_s) == 2) {
        PlyType t;
        if (std::string(type_s) == "list") { set_error("list property in vertex"); return -1; }
        if (!ply_type(type_s, &t)) { set_error(std::string("bad type ") + type_s); return -1; }
        props.emplace_back(prop_s, t);
      }
    }
  }
  if (n_vert == 0 || props.empty()) { set_error("no vertex element"); return -1; }

  *n_vertices = n_vert;
  *n_props = static_cast<int32_t>(props.size());
  if (out == nullptr) {
    std::string names;
    for (size_t i = 0; i < props.size(); i++) {
      if (i) names += ",";
      names += props[i].first;
    }
    if (static_cast<int64_t>(names.size()) + 1 > name_buf_len) {
      set_error("name buffer too small");
      return -1;
    }
    std::memcpy(name_buf, names.c_str(), names.size() + 1);
    return 0;
  }

  size_t stride = 0;
  for (auto& p : props) stride += p.second.size;
  if (body_off + stride * static_cast<size_t>(n_vert) > buf.data.size()) {
    set_error("ply body truncated");
    return -1;
  }
  const uint8_t* body = buf.data.data() + body_off;
  // SoA transpose with per-property output columns
  size_t off = 0;
  for (size_t pi = 0; pi < props.size(); pi++) {
    PlyType t = props[pi].second;
    float* col = out + pi * n_vert;
    const uint8_t* p = body + off;
    for (int64_t v = 0; v < n_vert; v++, p += stride) col[v] = convert_to_f32(p, t);
    off += t.size;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// PLY writer: float32 properties, binary little endian (the reference
// snapshot layout is all-float, `gaussian_model.py:246`).
// `cols` is n_props arrays of n_vertices floats (same layout as the reader).
// ---------------------------------------------------------------------------

int gsplat_ply_write(const char* path, int64_t n_vertices, int32_t n_props,
                     const char* names_csv, const float* cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) { set_error(std::string("cannot open ") + path); return -1; }
  std::string header = "ply\nformat binary_little_endian 1.0\n";
  header += "element vertex " + std::to_string(n_vertices) + "\n";
  {
    std::string names(names_csv);
    size_t start = 0;
    while (start <= names.size()) {
      size_t comma = names.find(',', start);
      std::string nm = names.substr(
          start, comma == std::string::npos ? std::string::npos : comma - start);
      if (!nm.empty()) header += "property float " + nm + "\n";
      if (comma == std::string::npos) break;
      start = comma + 1;
    }
  }
  header += "end_header\n";
  std::fwrite(header.data(), 1, header.size(), f);

  // row-interleave (AoS) on the fly, 64k-row blocks to bound memory
  const int64_t kBlock = 65536;
  std::vector<float> row_block(static_cast<size_t>(kBlock) * n_props);
  for (int64_t base = 0; base < n_vertices; base += kBlock) {
    int64_t rows = std::min(kBlock, n_vertices - base);
    for (int32_t p = 0; p < n_props; p++) {
      const float* col = cols + static_cast<int64_t>(p) * n_vertices + base;
      for (int64_t r = 0; r < rows; r++) row_block[r * n_props + p] = col[r];
    }
    std::fwrite(row_block.data(), sizeof(float), static_cast<size_t>(rows) * n_props, f);
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin reader (two-call protocol like the PLY reader).
// Record: id(u64) xyz(3xf64) rgb(3xu1) error(f64) track_len(u64) track(2xi4 each)
// ---------------------------------------------------------------------------

int gsplat_colmap_points3d(const char* path, int64_t* n_points, float* xyz_out,
                           uint8_t* rgb_out, float* err_out) {
  Buffer buf = read_file(path);
  if (!buf.ok) { set_error(std::string("cannot read ") + path); return -1; }
  if (buf.data.size() < 8) { set_error("truncated points3D.bin"); return -1; }
  uint64_t n;
  std::memcpy(&n, buf.data.data(), 8);
  *n_points = static_cast<int64_t>(n);
  if (xyz_out == nullptr) return 0;

  size_t off = 8;
  for (uint64_t i = 0; i < n; i++) {
    if (off + 51 > buf.data.size()) { set_error("truncated record"); return -1; }
    double xyz[3];
    std::memcpy(xyz, buf.data.data() + off + 8, 24);
    xyz_out[i * 3 + 0] = static_cast<float>(xyz[0]);
    xyz_out[i * 3 + 1] = static_cast<float>(xyz[1]);
    xyz_out[i * 3 + 2] = static_cast<float>(xyz[2]);
    std::memcpy(rgb_out + i * 3, buf.data.data() + off + 32, 3);
    double err;
    std::memcpy(&err, buf.data.data() + off + 35, 8);
    err_out[i] = static_cast<float>(err);
    uint64_t track_len;
    std::memcpy(&track_len, buf.data.data() + off + 43, 8);
    off += 51 + 8 * track_len;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP images.bin reader. Flattened two-call protocol:
//   call 1 (qt_out==null): *n_images, *names_len (bytes incl. separators)
//   call 2: qt_out[(4+3)*n]   qvec wxyz + tvec per image (f64->f32)
//           ids_out[2*n]      image_id, camera_id
//           names_out         '\n'-joined image names
// 2D point observations are skipped (the reference training path never uses
// them, `colmap_loader.py:180-213` discards xys for training too).
// ---------------------------------------------------------------------------

int gsplat_colmap_images(const char* path, int64_t* n_images, int64_t* names_len,
                         float* qt_out, int32_t* ids_out, char* names_out) {
  Buffer buf = read_file(path);
  if (!buf.ok) { set_error(std::string("cannot read ") + path); return -1; }
  if (buf.data.size() < 8) { set_error("truncated images.bin"); return -1; }
  uint64_t n;
  std::memcpy(&n, buf.data.data(), 8);
  *n_images = static_cast<int64_t>(n);

  size_t off = 8;
  int64_t names_bytes = 0;
  for (uint64_t i = 0; i < n; i++) {
    if (off + 64 > buf.data.size()) { set_error("truncated image record"); return -1; }
    int32_t image_id;
    std::memcpy(&image_id, buf.data.data() + off, 4);
    double qt[7];
    std::memcpy(qt, buf.data.data() + off + 4, 56);
    int32_t camera_id;
    std::memcpy(&camera_id, buf.data.data() + off + 60, 4);
    off += 64;
    size_t name_start = off;
    while (off < buf.data.size() && buf.data[off] != 0) off++;
    if (off >= buf.data.size()) { set_error("unterminated image name"); return -1; }
    size_t name_len = off - name_start;
    off++;  // nul
    uint64_t n_pts;
    if (off + 8 > buf.data.size()) { set_error("truncated n_points2D"); return -1; }
    std::memcpy(&n_pts, buf.data.data() + off, 8);
    off += 8 + 24 * n_pts;

    if (qt_out != nullptr) {
      for (int k = 0; k < 7; k++)
        qt_out[i * 7 + k] = static_cast<float>(qt[k]);
      ids_out[i * 2 + 0] = image_id;
      ids_out[i * 2 + 1] = camera_id;
      std::memcpy(names_out + names_bytes, buf.data.data() + name_start, name_len);
      names_out[names_bytes + name_len] = '\n';
    }
    names_bytes += static_cast<int64_t>(name_len) + 1;
  }
  *names_len = names_bytes;
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP cameras.bin reader.
//   out (cap rows of 12 floats): camera_id, model_id, width, height, params[0..7]
// ---------------------------------------------------------------------------

int gsplat_colmap_cameras(const char* path, int64_t* n_cameras, float* out) {
  static const int kNumParams[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  Buffer buf = read_file(path);
  if (!buf.ok) { set_error(std::string("cannot read ") + path); return -1; }
  uint64_t n;
  std::memcpy(&n, buf.data.data(), 8);
  *n_cameras = static_cast<int64_t>(n);
  if (out == nullptr) return 0;

  size_t off = 8;
  for (uint64_t i = 0; i < n; i++) {
    if (off + 24 > buf.data.size()) { set_error("truncated camera record"); return -1; }
    int32_t cam_id, model_id;
    uint64_t w, h;
    std::memcpy(&cam_id, buf.data.data() + off, 4);
    std::memcpy(&model_id, buf.data.data() + off + 4, 4);
    std::memcpy(&w, buf.data.data() + off + 8, 8);
    std::memcpy(&h, buf.data.data() + off + 16, 8);
    off += 24;
    if (model_id < 0 || model_id > 10) { set_error("bad camera model id"); return -1; }
    int np = kNumParams[model_id];
    float* row = out + i * 12;
    row[0] = static_cast<float>(cam_id);
    row[1] = static_cast<float>(model_id);
    row[2] = static_cast<float>(w);
    row[3] = static_cast<float>(h);
    for (int p = 0; p < np && p < 8; p++) {
      double v;
      std::memcpy(&v, buf.data.data() + off + 8 * p, 8);
      row[4 + p] = static_cast<float>(v);
    }
    off += 8 * static_cast<size_t>(np);
  }
  return 0;
}

}  // extern "C"
