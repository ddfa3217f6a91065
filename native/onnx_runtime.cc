// Native ONNX runtime for the exported policy graph.
//
// Plays the role ONNX Runtime's C++ engine plays in the reference
// (test-onnx InferenceSession, sb_rl.py:211-220): parses the ModelProto
// protobuf emitted by balance_robot_tpu/export/onnx_writer.py (opset 11)
// and executes the graph in float32.  Dependency-free: the protobuf wire
// format is decoded directly (varint + length-delimited fields, field
// numbers from onnx.proto3), mirroring the Python parser in
// balance_robot_tpu/export/onnx_runtime.py — the two are cross-checked to
// 1e-6 against the JAX policy in tests/test_onnx.py.
//
// Supported ops: Gemm (alpha/beta/transA/transB), MatMul, Add, Sub, Mul,
// Tanh, Relu, Sigmoid, Identity — the closure of what the policy exporter
// emits, plus common MLP variants.
//
// Exposed via a tiny C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: make -C native   (-> native/libonnx_runtime.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ------------------------------------------------------------ wire format

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t i = 0;
  bool fail = false;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (i < n) {
      uint8_t b = p[i++];
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift > 70) break;
    }
    fail = true;
    return 0;
  }

  // returns false at end of buffer; fills field/wire/val or sub-span
  bool field(uint32_t* fnum, uint32_t* wire, uint64_t* val,
             const uint8_t** sub, size_t* sublen) {
    if (i >= n || fail) return false;
    uint64_t key = varint();
    *fnum = static_cast<uint32_t>(key >> 3);
    *wire = static_cast<uint32_t>(key & 7);
    *sub = nullptr;
    *sublen = 0;
    switch (*wire) {
      case 0:
        *val = varint();
        return !fail;
      case 1:
        if (i + 8 > n) return fail = true, false;
        std::memcpy(val, p + i, 8);
        i += 8;
        return true;
      case 2: {
        uint64_t len = varint();
        if (fail || i + len > n) return fail = true, false;
        *sub = p + i;
        *sublen = static_cast<size_t>(len);
        i += len;
        return true;
      }
      case 5:
        if (i + 4 > n) return fail = true, false;
        *val = 0;
        std::memcpy(val, p + i, 4);
        i += 4;
        return true;
      default:
        return fail = true, false;
    }
  }
};

// ------------------------------------------------------------ model model

struct Tensor {
  std::vector<int64_t> dims;
  std::vector<float> data;

  int64_t rows() const { return dims.size() == 2 ? dims[0] : 1; }
  int64_t cols() const {
    return dims.empty() ? static_cast<int64_t>(data.size()) : dims.back();
  }
};

struct Attr {
  float f = 0;
  int64_t i = 0;
  bool has_f = false, has_i = false;
};

struct Node {
  std::string op, name;
  std::vector<std::string> inputs, outputs;
  std::map<std::string, Attr> attrs;
};

struct Model {
  std::map<std::string, Tensor> initializers;
  std::vector<Node> nodes;
  std::vector<std::string> inputs, outputs;  // graph IO (minus initializers)
  std::string err;
};

std::string str(const uint8_t* p, size_t n) {
  return std::string(reinterpret_cast<const char*>(p), n);
}

bool parse_tensor(const uint8_t* buf, size_t len, std::string* name,
                  Tensor* t) {
  Reader r{buf, len};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  int64_t dtype = 1;
  while (r.field(&f, &w, &v, &sub, &sl)) {
    switch (f) {
      case 1:
        if (w == 0) {
          t->dims.push_back(static_cast<int64_t>(v));
        } else {  // packed
          Reader rr{sub, sl};
          while (rr.i < rr.n && !rr.fail)
            t->dims.push_back(static_cast<int64_t>(rr.varint()));
        }
        break;
      case 2:
        dtype = static_cast<int64_t>(v);
        break;
      case 8:
        *name = str(sub, sl);
        break;
      case 9:  // raw_data (little-endian float32)
        t->data.resize(sl / 4);
        std::memcpy(t->data.data(), sub, t->data.size() * 4);
        break;
      case 4:  // float_data
        if (w == 2) {
          t->data.resize(sl / 4);
          std::memcpy(t->data.data(), sub, t->data.size() * 4);
        } else {
          float fv;
          uint32_t u = static_cast<uint32_t>(v);
          std::memcpy(&fv, &u, 4);
          t->data.push_back(fv);
        }
        break;
      default:
        break;
    }
  }
  if (r.fail || dtype != 1) return false;
  size_t expect = 1;
  for (int64_t d : t->dims) expect *= static_cast<size_t>(d);
  return t->dims.empty() ? !t->data.empty() : t->data.size() == expect;
}

void parse_attr(const uint8_t* buf, size_t len, Node* node) {
  Reader r{buf, len};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  std::string name;
  Attr a;
  while (r.field(&f, &w, &v, &sub, &sl)) {
    if (f == 1) name = str(sub, sl);
    else if (f == 2) {  // f (fixed32)
      uint32_t u = static_cast<uint32_t>(v);
      std::memcpy(&a.f, &u, 4);
      a.has_f = true;
    } else if (f == 3) {  // i
      a.i = static_cast<int64_t>(v);
      a.has_i = true;
    }
  }
  if (!name.empty()) node->attrs[name] = a;
}

bool parse_node(const uint8_t* buf, size_t len, Node* node) {
  Reader r{buf, len};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  while (r.field(&f, &w, &v, &sub, &sl)) {
    switch (f) {
      case 1: node->inputs.push_back(str(sub, sl)); break;
      case 2: node->outputs.push_back(str(sub, sl)); break;
      case 3: node->name = str(sub, sl); break;
      case 4: node->op = str(sub, sl); break;
      case 5: parse_attr(sub, sl, node); break;
      default: break;
    }
  }
  return !r.fail && !node->op.empty();
}

std::string value_info_name(const uint8_t* buf, size_t len) {
  Reader r{buf, len};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  std::string name;
  while (r.field(&f, &w, &v, &sub, &sl))
    if (f == 1) name = str(sub, sl);
  return name;
}

bool parse_graph(const uint8_t* buf, size_t len, Model* m) {
  Reader r{buf, len};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  while (r.field(&f, &w, &v, &sub, &sl)) {
    switch (f) {
      case 1: {
        Node node;
        if (!parse_node(sub, sl, &node)) {
          m->err = "bad node";
          return false;
        }
        m->nodes.push_back(std::move(node));
        break;
      }
      case 5: {
        std::string name;
        Tensor t;
        if (!parse_tensor(sub, sl, &name, &t)) {
          m->err = "bad initializer";
          return false;
        }
        m->initializers[name] = std::move(t);
        break;
      }
      case 11: m->inputs.push_back(value_info_name(sub, sl)); break;
      case 12: m->outputs.push_back(value_info_name(sub, sl)); break;
      default: break;
    }
  }
  return !r.fail;
}

// ------------------------------------------------------------- execution

bool gemm(const Node& n, const Tensor& A, const Tensor& B, const Tensor* C,
          Tensor* out) {
  float alpha = 1.0f, beta = 1.0f;
  bool tA = false, tB = false;
  auto it = n.attrs.find("alpha");
  if (it != n.attrs.end() && it->second.has_f) alpha = it->second.f;
  it = n.attrs.find("beta");
  if (it != n.attrs.end() && it->second.has_f) beta = it->second.f;
  it = n.attrs.find("transA");
  if (it != n.attrs.end()) tA = it->second.i != 0;
  it = n.attrs.find("transB");
  if (it != n.attrs.end()) tB = it->second.i != 0;

  int64_t am = tA ? A.cols() : A.rows(), ak = tA ? A.rows() : A.cols();
  int64_t bk = tB ? B.cols() : B.rows(), bn = tB ? B.rows() : B.cols();
  if (ak != bk) return false;
  out->dims = {am, bn};
  out->data.assign(static_cast<size_t>(am * bn), 0.0f);
  for (int64_t i = 0; i < am; ++i)
    for (int64_t k = 0; k < ak; ++k) {
      float a = tA ? A.data[k * am + i] : A.data[i * ak + k];
      const float* brow = tB ? nullptr : &B.data[k * bn];
      for (int64_t j = 0; j < bn; ++j) {
        float b = tB ? B.data[j * bk + k] : brow[j];
        out->data[i * bn + j] += alpha * a * b;
      }
    }
  if (C) {  // unidirectional broadcast of C over rows
    int64_t cn = C->cols();
    if (cn != bn && static_cast<int64_t>(C->data.size()) != am * bn)
      return false;
    for (int64_t i = 0; i < am; ++i)
      for (int64_t j = 0; j < bn; ++j) {
        float c = (static_cast<int64_t>(C->data.size()) == am * bn)
                      ? C->data[i * bn + j]
                      : C->data[j];
        out->data[i * bn + j] += beta * c;
      }
  }
  return true;
}

bool elementwise2(const std::string& op, const Tensor& A, const Tensor& B,
                  Tensor* out) {
  // supports equal sizes or row-vector broadcast of B
  size_t na = A.data.size(), nb = B.data.size();
  if (nb != na && (na % nb) != 0) return false;
  out->dims = A.dims;
  out->data.resize(na);
  for (size_t i = 0; i < na; ++i) {
    float a = A.data[i], b = B.data[i % nb];
    out->data[i] = op == "Add" ? a + b : op == "Sub" ? a - b : a * b;
  }
  return true;
}

bool run_graph(const Model& m, const float* input, int n_in,
               std::map<std::string, Tensor>* values, std::string* err) {
  *values = m.initializers;
  if (m.inputs.empty()) {
    *err = "graph has no input";
    return false;
  }
  Tensor in;
  in.dims = {1, n_in};
  in.data.assign(input, input + n_in);
  (*values)[m.inputs.front()] = std::move(in);

  for (const Node& n : m.nodes) {
    std::vector<const Tensor*> args;
    for (const std::string& name : n.inputs) {
      auto it = values->find(name);
      if (it == values->end()) {
        *err = "undefined input " + name + " of node " + n.name;
        return false;
      }
      args.push_back(&it->second);
    }
    Tensor out;
    bool ok = false;
    if (n.op == "Gemm" && args.size() >= 2) {
      ok = gemm(n, *args[0], *args[1], args.size() > 2 ? args[2] : nullptr,
                &out);
    } else if (n.op == "MatMul" && args.size() == 2) {
      Node plain;  // Gemm defaults, no bias
      ok = gemm(plain, *args[0], *args[1], nullptr, &out);
    } else if ((n.op == "Add" || n.op == "Sub" || n.op == "Mul") &&
               args.size() == 2) {
      ok = elementwise2(n.op, *args[0], *args[1], &out);
    } else if (n.op == "Tanh" || n.op == "Relu" || n.op == "Sigmoid" ||
               n.op == "Identity") {
      out = *args[0];
      if (n.op == "Tanh")
        for (float& x : out.data) x = std::tanh(x);
      else if (n.op == "Relu")
        for (float& x : out.data) x = x > 0 ? x : 0;
      else if (n.op == "Sigmoid")
        for (float& x : out.data) x = 1.0f / (1.0f + std::exp(-x));
      ok = true;
    } else {
      *err = "unsupported op " + n.op;
      return false;
    }
    if (!ok) {
      *err = "shape error in node " + n.name + " (" + n.op + ")";
      return false;
    }
    (*values)[n.outputs.front()] = std::move(out);
  }
  for (const std::string& o : m.outputs)
    if (!values->count(o)) {
      *err = "graph output " + o + " never produced";
      return false;
    }
  return true;
}

}  // namespace

// ----------------------------------------------------------------- C ABI

extern "C" {

Model* onnx_load(const char* path, char* errbuf, int errlen) {
  auto fail = [&](const std::string& msg) -> Model* {
    if (errbuf && errlen > 0) std::snprintf(errbuf, errlen, "%s", msg.c_str());
    return nullptr;
  };
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return fail("cannot open file");
  std::fseek(fp, 0, SEEK_END);
  long sz = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  size_t got = std::fread(buf.data(), 1, buf.size(), fp);
  std::fclose(fp);
  if (got != buf.size()) return fail("short read");

  auto m = std::make_unique<Model>();
  Reader r{buf.data(), buf.size()};
  uint32_t f, w;
  uint64_t v;
  const uint8_t* sub;
  size_t sl;
  bool have_graph = false;
  while (r.field(&f, &w, &v, &sub, &sl)) {
    if (f == 7) {
      if (!parse_graph(sub, sl, m.get()))
        return fail("bad graph: " + m->err);
      have_graph = true;
    }
  }
  if (r.fail || !have_graph) return fail("not an ONNX ModelProto");
  return m.release();
}

void onnx_free(Model* m) { delete m; }

int onnx_input_size(Model* m) {
  // derived from the first Gemm's weight rows (input value_info carries
  // shape, but the executor only needs the contraction dim)
  for (const Node& n : m->nodes)
    if (n.op == "Gemm" && n.inputs.size() >= 2) {
      auto it = m->initializers.find(n.inputs[1]);
      if (it != m->initializers.end()) return static_cast<int>(
          it->second.rows());
    }
  return -1;
}

int onnx_num_outputs(Model* m) { return static_cast<int>(m->outputs.size()); }

const char* onnx_output_name(Model* m, int i) {
  if (i < 0 || i >= static_cast<int>(m->outputs.size())) return "";
  return m->outputs[i].c_str();
}

// Runs the graph on a single observation; writes output `out_idx` into
// out[0..cap); returns its length, or -1 (message in errbuf).
int onnx_run(Model* m, const float* input, int n_in, int out_idx, float* out,
             int cap, char* errbuf, int errlen) {
  std::map<std::string, Tensor> values;
  std::string err;
  if (out_idx < 0 || out_idx >= static_cast<int>(m->outputs.size())) {
    err = "output index out of range";
  } else if (run_graph(*m, input, n_in, &values, &err)) {
    const Tensor& t = values[m->outputs[out_idx]];
    int n = static_cast<int>(t.data.size());
    if (n > cap) {
      err = "output buffer too small";
    } else {
      std::memcpy(out, t.data.data(), n * sizeof(float));
      return n;
    }
  }
  if (errbuf && errlen > 0) std::snprintf(errbuf, errlen, "%s", err.c_str());
  return -1;
}

}  // extern "C"
