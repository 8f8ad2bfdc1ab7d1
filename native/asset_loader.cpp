// Native mesh loaders (host data-loading component).
//
// Role parity with the reference's C++ asset layer: the tinyobjloader-based
// OBJ path (ModelLoader.cpp:275-448) and the minimal PLY parser + mesh
// normalization (Loader.cpp:207-319, :98-205). Re-designed rather than
// ported:
//   * one single-pass tokenizer over a fully buffered file (no iostream
//     per-line overhead, no vertex dedup pass — the renderer consumes flat
//     (T, 3, 3) triangles, not indexed meshes),
//   * fan triangulation of arbitrary polygons at parse time,
//   * PLY supports ascii AND binary_little_endian with arbitrary leading
//     property layouts (the reference requires ascii x/y/z-first),
//   * the reference's transforms applied in-place: OBJ scale -> rotateY ->
//     offset (ModelLoader.cpp:438-445), PLY center/unit-scale/offset
//     (Loader.cpp:104-150).
//
// C ABI for ctypes: two-phase (parse returning a handle + triangle count,
// then copy-out + free) because the triangle count is unknown up front.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

thread_local std::string g_error;

struct Mesh {
  std::vector<float> tris;  // T * 9 floats
};

std::map<int64_t, Mesh> g_meshes;
int64_t g_next_handle = 1;

bool read_file(const char *path, std::string &out) {
  FILE *f = std::fopen(path, "rb");
  if (!f) {
    g_error = std::string("cannot open ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(&out[0], 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) {
    g_error = std::string("short read on ") + path;
    return false;
  }
  return true;
}

inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char *next_line(const char *p, const char *end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// ---------------------------------------------------------------------------
// OBJ
// ---------------------------------------------------------------------------

bool parse_obj(const std::string &text, std::vector<float> &positions,
               std::vector<int32_t> &faces) {
  const char *p = text.data();
  const char *end = p + text.size();
  std::vector<int32_t> idx;
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      char *q;
      p += 2;
      for (int k = 0; k < 3; ++k) {
        float v = std::strtof(p, &q);
        if (q == p) {
          g_error = "OBJ: malformed vertex line";
          return false;
        }
        positions.push_back(v);
        p = q;
      }
    } else if (p + 1 < end && p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      idx.clear();
      const int32_t nv = static_cast<int32_t>(positions.size() / 3);
      while (true) {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n' || *p == '#') break;
        char *q;
        long i = std::strtol(p, &q, 10);
        if (q == p) break;
        p = q;
        // skip /vt/vn part of the token
        while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          ++p;
        idx.push_back(i > 0 ? static_cast<int32_t>(i - 1)
                            : nv + static_cast<int32_t>(i));
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k) {  // fan triangulation
        faces.push_back(idx[0]);
        faces.push_back(idx[k]);
        faces.push_back(idx[k + 1]);
      }
    }
    p = next_line(p, end);
  }
  return true;
}

// ---------------------------------------------------------------------------
// PLY (ascii + binary_little_endian)
// ---------------------------------------------------------------------------

int type_size(const std::string &t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

double read_scalar(const char *&p, const std::string &t) {
  union {
    uint8_t u8;
    int8_t i8;
    uint16_t u16;
    int16_t i16;
    uint32_t u32;
    int32_t i32;
    float f32;
    double f64;
  } v;
  int n = type_size(t);
  std::memcpy(&v, p, static_cast<size_t>(n));
  p += n;
  if (t == "uchar" || t == "uint8") return v.u8;
  if (t == "char" || t == "int8") return v.i8;
  if (t == "ushort" || t == "uint16") return v.u16;
  if (t == "short" || t == "int16") return v.i16;
  if (t == "uint" || t == "uint32") return v.u32;
  if (t == "int" || t == "int32") return v.i32;
  if (t == "float" || t == "float32") return v.f32;
  return v.f64;
}

struct PlyProp {
  std::string type;        // scalar type, or list element type
  std::string count_type;  // non-empty for list properties
  std::string name;
};

bool parse_ply(const std::string &text, std::vector<float> &positions,
               std::vector<int32_t> &faces) {
  const char *p = text.data();
  const char *end = p + text.size();
  if (text.size() < 3 || std::strncmp(p, "ply", 3) != 0) {
    g_error = "PLY: missing magic";
    return false;
  }
  p = next_line(p, end);

  std::string fmt;
  long n_vertices = 0, n_faces = 0;
  std::vector<PlyProp> vprops, fprops;
  std::string cur_element;
  while (p < end) {
    const char *line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;
    std::string line(p, static_cast<size_t>(line_end - p));
    if (!line.empty() && line.back() == '\r') line.pop_back();
    p = line_end < end ? line_end + 1 : end;

    char w0[32] = {0}, w1[32] = {0}, w2[32] = {0}, w3[32] = {0}, w4[32] = {0};
    std::sscanf(line.c_str(), "%31s %31s %31s %31s %31s", w0, w1, w2, w3, w4);
    if (!std::strcmp(w0, "format")) {
      fmt = w1;
    } else if (!std::strcmp(w0, "element")) {
      cur_element = w1;
      if (cur_element == "vertex") n_vertices = std::atol(w2);
      if (cur_element == "face") n_faces = std::atol(w2);
    } else if (!std::strcmp(w0, "property")) {
      PlyProp prop;
      if (!std::strcmp(w1, "list")) {
        prop.count_type = w2;
        prop.type = w3;
        prop.name = w4;
      } else {
        prop.type = w1;
        prop.name = w2;
      }
      if (cur_element == "vertex") vprops.push_back(prop);
      if (cur_element == "face") fprops.push_back(prop);
    } else if (!std::strcmp(w0, "end_header")) {
      break;
    }
  }
  if (fmt != "ascii" && fmt != "binary_little_endian") {
    g_error = "PLY: unsupported format " + fmt;
    return false;
  }
  int xi = -1, yi = -1, zi = -1;
  for (size_t i = 0; i < vprops.size(); ++i) {
    if (vprops[i].name == "x") xi = static_cast<int>(i);
    if (vprops[i].name == "y") yi = static_cast<int>(i);
    if (vprops[i].name == "z") zi = static_cast<int>(i);
    if (!vprops[i].count_type.empty()) {
      g_error = "PLY: list property on vertex element unsupported";
      return false;
    }
  }
  if (xi < 0 || yi < 0 || zi < 0) {
    g_error = "PLY: vertex element lacks x/y/z";
    return false;
  }

  positions.resize(static_cast<size_t>(n_vertices) * 3);
  std::vector<int32_t> idx;
  if (fmt == "ascii") {
    char *q;
    for (long v = 0; v < n_vertices; ++v) {
      for (size_t k = 0; k < vprops.size(); ++k) {
        float val = std::strtof(p, &q);
        if (q == p) {
          g_error = "PLY: truncated vertex data";
          return false;
        }
        p = q;
        if (static_cast<int>(k) == xi) positions[v * 3 + 0] = val;
        if (static_cast<int>(k) == yi) positions[v * 3 + 1] = val;
        if (static_cast<int>(k) == zi) positions[v * 3 + 2] = val;
      }
    }
    for (long f = 0; f < n_faces; ++f) {
      long count = std::strtol(p, &q, 10);
      if (q == p) {
        g_error = "PLY: truncated face data";
        return false;
      }
      p = q;
      idx.clear();
      for (long k = 0; k < count; ++k) {
        idx.push_back(static_cast<int32_t>(std::strtol(p, &q, 10)));
        p = q;
      }
      // trailing per-face properties (e.g. material) are skipped by strtol
      // failing to consume them only if numeric — skip to end of line.
      p = next_line(p, end);
      for (size_t k = 1; k + 1 < idx.size(); ++k) {
        faces.push_back(idx[0]);
        faces.push_back(idx[k]);
        faces.push_back(idx[k + 1]);
      }
    }
  } else {
    for (long v = 0; v < n_vertices; ++v) {
      for (size_t k = 0; k < vprops.size(); ++k) {
        if (p + type_size(vprops[k].type) > end) {
          g_error = "PLY: truncated binary vertex data";
          return false;
        }
        double val = read_scalar(p, vprops[k].type);
        if (static_cast<int>(k) == xi) positions[v * 3 + 0] = static_cast<float>(val);
        if (static_cast<int>(k) == yi) positions[v * 3 + 1] = static_cast<float>(val);
        if (static_cast<int>(k) == zi) positions[v * 3 + 2] = static_cast<float>(val);
      }
    }
    for (long f = 0; f < n_faces; ++f) {
      idx.clear();
      for (size_t pr = 0; pr < fprops.size(); ++pr) {
        const PlyProp &prop = fprops[pr];
        if (!prop.count_type.empty()) {
          long count = static_cast<long>(read_scalar(p, prop.count_type));
          for (long k = 0; k < count; ++k) {
            double val = read_scalar(p, prop.type);
            if (prop.name == "vertex_indices" || prop.name == "vertex_index")
              idx.push_back(static_cast<int32_t>(val));
          }
        } else {
          read_scalar(p, prop.type);  // skip scalar face property
        }
        if (p > end) {
          g_error = "PLY: truncated binary face data";
          return false;
        }
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k) {
        faces.push_back(idx[0]);
        faces.push_back(idx[k]);
        faces.push_back(idx[k + 1]);
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Transforms
// ---------------------------------------------------------------------------

// OBJ path: v *= scale; rotateY(v, deg); v += offset (ModelLoader.cpp:438-445).
void transform_obj(std::vector<float> &pos, const float *scale, float rot_deg,
                   const float *offset) {
  const float rad = rot_deg * 0.017453292519943295f;
  const float c = std::cos(rad), s = std::sin(rad);
  for (size_t i = 0; i < pos.size(); i += 3) {
    float x = pos[i] * scale[0];
    float y = pos[i + 1] * scale[1];
    float z = pos[i + 2] * scale[2];
    float xr = c * x + s * z;
    float zr = -s * x + c * z;
    pos[i] = xr + offset[0];
    pos[i + 1] = y + offset[1];
    pos[i + 2] = zr + offset[2];
  }
}

// PLY path: center at origin, uniform-scale so max |coord| == max_coord,
// translate by offset (processTriangleData, Loader.cpp:104-150).
void normalize_ply(std::vector<float> &pos, const float *offset,
                   float max_coord, bool normalize) {
  if (pos.empty()) return;
  if (normalize) {
    float lo[3] = {pos[0], pos[1], pos[2]};
    float hi[3] = {pos[0], pos[1], pos[2]};
    for (size_t i = 0; i < pos.size(); i += 3)
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], pos[i + k]);
        hi[k] = std::max(hi[k], pos[i + k]);
      }
    float center[3] = {(lo[0] + hi[0]) * 0.5f, (lo[1] + hi[1]) * 0.5f,
                       (lo[2] + hi[2]) * 0.5f};
    float maxi = 0.0f;
    for (size_t i = 0; i < pos.size(); i += 3)
      for (int k = 0; k < 3; ++k)
        maxi = std::max(maxi, std::fabs(pos[i + k] - center[k]));
    const float sc = maxi > 0.0f ? max_coord / maxi : 1.0f;
    for (size_t i = 0; i < pos.size(); i += 3)
      for (int k = 0; k < 3; ++k)
        pos[i + k] = (pos[i + k] - center[k]) * sc + offset[k];
  } else {
    for (size_t i = 0; i < pos.size(); i += 3)
      for (int k = 0; k < 3; ++k) pos[i + k] += offset[k];
  }
}

}  // namespace

extern "C" {

// Parse + transform a mesh file. kind: 0 = OBJ, 1 = PLY.
// OBJ uses scale3/rotate_y_deg/offset3; PLY uses offset3/normalize/max_coord.
// Returns a handle (> 0) and writes the triangle count, or -1 on error.
int64_t rtnw_load_mesh(const char *path, int32_t kind, const float *scale3,
                       float rotate_y_deg, const float *offset3,
                       int32_t normalize, float max_coord,
                       int32_t *out_tri_count) {
  std::string text;
  if (!read_file(path, text)) return -1;
  std::vector<float> positions;
  std::vector<int32_t> faces;
  bool ok = kind == 0 ? parse_obj(text, positions, faces)
                      : parse_ply(text, positions, faces);
  if (!ok) return -1;
  if (kind == 0)
    transform_obj(positions, scale3, rotate_y_deg, offset3);
  else
    normalize_ply(positions, offset3, max_coord, normalize != 0);

  const int64_t nv = static_cast<int64_t>(positions.size() / 3);
  Mesh mesh;
  mesh.tris.reserve(faces.size() * 3);
  for (size_t i = 0; i < faces.size(); ++i) {
    int64_t vi = faces[i];
    if (vi < 0 || vi >= nv) {
      g_error = "face index out of range";
      return -1;
    }
    mesh.tris.push_back(positions[vi * 3 + 0]);
    mesh.tris.push_back(positions[vi * 3 + 1]);
    mesh.tris.push_back(positions[vi * 3 + 2]);
  }
  *out_tri_count = static_cast<int32_t>(mesh.tris.size() / 9);
  int64_t handle = g_next_handle++;
  g_meshes[handle] = std::move(mesh);
  return handle;
}

// Copy the (T, 3, 3) triangles out and free the handle. Returns 0, or -1
// for an unknown handle.
int32_t rtnw_mesh_read(int64_t handle, float *out) {
  auto it = g_meshes.find(handle);
  if (it == g_meshes.end()) {
    g_error = "unknown mesh handle";
    return -1;
  }
  std::memcpy(out, it->second.tris.data(),
              it->second.tris.size() * sizeof(float));
  g_meshes.erase(it);
  return 0;
}

const char *rtnw_last_error() { return g_error.c_str(); }

}  // extern "C"
