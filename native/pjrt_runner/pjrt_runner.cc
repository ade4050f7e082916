// pjrt_runner — native C++ inference runtime for exported CerberusNet
// programs (SURVEY.md §3 C16, §4.3, §7 step 8).
//
// TPU-native analogue of the reference's C++ TensorRT engine builder/runner:
// where the reference parses ONNX, patches in custom-op plugins (C17), and
// builds a serialized fp16 engine for Xavier, this loads the StableHLO
// artifact written by cerberusnet_tpu.export (weights baked in, Pallas
// correlation kernels embedded as tpu custom calls — no plugin registry
// needed), compiles it through ANY PJRT C-API plugin (libtpu.so on a TPU
// host; any conforming plugin elsewhere), executes it, and reports timing.
//
// Usage:
//   pjrt_runner --plugin /path/libtpu.so --model <export_dir>
//               [--iters 10] [--opt key=value ...]
//               [--inputs a.bin,b.bin,...] [--dump-outputs DIR]
//               [--cache DIR]
//
// --opt values: integers are passed as PJRT int64 named values, everything
// else as strings (matches how jax passes plugin options).
// --inputs: raw little-endian tensor files matching the manifest's input
//   shapes/dtypes byte-for-byte (tools/runner_io.py converts .npy <-> .bin);
//   without it inputs are zero-filled (benchmark mode).
// --pngs: decode PNG image files with the framework's native decoder
//   (native/dataload/png_decode.cc, linked in), normalize exactly like the
//   training pipeline ((x/255 - imagenet_mean)/std, f32, then
//   round-to-nearest-even cast to the manifest dtype) and feed them — the
//   fully-native serving path: PNG in -> predictions out, zero Python.
//   Images must match the exported (h, w) — artifacts are fixed-shape,
//   like a serialized TensorRT engine.
// --dump-outputs: write each output as DIR/output_<i>.bin plus
//   DIR/outputs.json ({shape, dtype} per output) — the full C++ inference
//   path: load artifact -> compile -> feed tensors -> collect predictions.
// --cache: serialized-executable cache directory (the TensorRT
//   serialized-engine analogue, SURVEY.md §4.3 "build fp16 engine ->
//   serialize"). First run compiles and writes
//   DIR/<hash(platform,mlir,opts)>.pjrt_exec; later runs
//   PJRT_Executable_DeserializeAndLoad it and skip compilation entirely.
//   Falls back to a fresh compile (and rewrites the cache) if the blob
//   fails to load (e.g. plugin version changed).
// --serve: persistent inference daemon (the deploy serving loop: the
//   engine stays warm in one process, requests stream over stdin/stdout —
//   what the reference's Xavier runtime does with its deserialized TRT
//   engine). After compile/cache-load prints "READY <n_in> <n_out>\n" on
//   stdout, then answers framed requests until EOF:
//     "INFER\n" + the raw bytes of every manifest input in order (dense
//       row-major, manifest dtype — the same bytes as --inputs files), or
//     "PNGS p1,p2,...\n" (server-side native PNG decode+preprocess), or
//     "QUIT\n" (exit 0).
//   Response per request: "OK <n_out>\n" then per output one header line
//     "OUT <dtype> <ndims> <d0> <d1> ... <nbytes>\n" followed by the raw
//     bytes (dense row-major). A malformed request prints "ERR <msg>\n"
//   and exits 1. Drive it with tools/runner_io.py serve-verify.
//
// Build: see Makefile (headers vendored from the XLA pjrt_c_api.h contract).

#include <dlfcn.h>
#include <sys/stat.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct Shape {
  std::vector<int64_t> dims;
  std::string dtype;
};

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_runner: %s\n", msg.c_str());
  std::exit(1);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// Minimal JSON scanning for the manifest this repo writes (known schema —
// not a general parser). Extracts the "inputs" array of {shape, dtype}.
std::vector<Shape> ParseManifestInputs(const std::string& json) {
  std::vector<Shape> shapes;
  size_t inputs_pos = json.find("\"inputs\"");
  if (inputs_pos == std::string::npos) Die("manifest missing \"inputs\"");
  size_t end = json.find("\"outputs\"", inputs_pos);
  size_t pos = inputs_pos;
  while (true) {
    size_t sh = json.find("\"shape\"", pos);
    if (sh == std::string::npos || sh > end) break;
    size_t lb = json.find('[', sh);
    size_t rb = json.find(']', lb);
    Shape s;
    std::stringstream nums(json.substr(lb + 1, rb - lb - 1));
    std::string tok;
    while (std::getline(nums, tok, ',')) {
      if (!tok.empty()) s.dims.push_back(std::stoll(tok));
    }
    size_t dt = json.find("\"dtype\"", rb);
    size_t q1 = json.find(':', dt);
    size_t q2 = json.find('"', q1);
    size_t q3 = json.find('"', q2 + 1);
    s.dtype = json.substr(q2 + 1, q3 - q2 - 1);
    shapes.push_back(std::move(s));
    pos = q3;
  }
  if (shapes.empty()) Die("no input shapes found in manifest");
  return shapes;
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& dtype, size_t* itemsize) {
  if (dtype == "float32") { *itemsize = 4; return PJRT_Buffer_Type_F32; }
  if (dtype == "bfloat16") { *itemsize = 2; return PJRT_Buffer_Type_BF16; }
  if (dtype == "float16") { *itemsize = 2; return PJRT_Buffer_Type_F16; }
  if (dtype == "int32") { *itemsize = 4; return PJRT_Buffer_Type_S32; }
  if (dtype == "uint8") { *itemsize = 1; return PJRT_Buffer_Type_U8; }
  Die("unsupported dtype " + dtype);
}

// FNV-1a 64-bit — cache key over (platform id + program + compile options).
uint64_t Fnv1a(const std::string& data, uint64_t h = 1469598103934665603ull) {
  for (unsigned char c : data) {
    h ^= c;
    h *= 1099511628211ull;
  }
  return h;
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

// Like Check, but non-fatal: logs and returns false on error (used for the
// executable-cache load, which falls back to a fresh compile).
bool TryCheck(PJRT_Error* err, const char* what) {
  if (err == nullptr) return true;
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "[pjrt_runner] %s: %.*s (falling back)\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  return false;
}

}  // namespace

// native PNG decode+preprocess (native/dataload/png_decode.cc, linked in):
// decodes an exact-size 8-bit PNG and writes the normalized (1, H, W, 3)
// model input (f32 arithmetic identical to encodings.preprocess_image;
// dtype_code 0 = float32, 1 = bfloat16 with round-to-nearest-even).
extern "C" int cnt_png_to_input(const char* path, uint32_t want_h,
                                uint32_t want_w, int dtype_code, void* out);
extern "C" const char* cnt_png_error(int code);

namespace {

std::vector<char> PngToInput(const std::string& path, int64_t want_h,
                             int64_t want_w, const std::string& dtype) {
  int dtype_code;
  size_t itemsize;
  if (dtype == "float32") { dtype_code = 0; itemsize = 4; }
  else if (dtype == "bfloat16") { dtype_code = 1; itemsize = 2; }
  else { Die("--pngs supports float32/bfloat16 inputs, got " + dtype); return {}; }
  std::vector<char> out(size_t(want_h) * want_w * 3 * itemsize);
  int rc = cnt_png_to_input(path.c_str(), uint32_t(want_h), uint32_t(want_w),
                            dtype_code, out.data());
  if (rc != 0)
    Die(path + ": " + cnt_png_error(rc) +
        " (image must be an 8-bit PNG of exactly " + std::to_string(want_h) +
        "x" + std::to_string(want_w) +
        " — artifacts are fixed-shape, like a serialized TRT engine)");
  return out;
}

// Decode K PNG frames into ONE contiguous (K, H, W, 3) host tensor — the
// producer-stacked serving input (export --stacked): the 3-frame assembly
// happens at decode time in host memory, so the device program starts from
// a single buffer and never pays the per-frame relayout copies the separate
// (1,H,W,3) parameters cost on TPU (~1.06 ms/frame in the r3 copy profile).
std::vector<char> PngsToStackedInput(const std::vector<std::string>& paths,
                                     const Shape& s) {
  int dtype_code;
  size_t itemsize;
  if (s.dtype == "float32") { dtype_code = 0; itemsize = 4; }
  else if (s.dtype == "bfloat16") { dtype_code = 1; itemsize = 2; }
  else { Die("png inputs support float32/bfloat16, got " + s.dtype); return {}; }
  const int64_t h = s.dims[1], w = s.dims[2];
  const size_t frame = size_t(h) * size_t(w) * 3 * itemsize;
  std::vector<char> out(frame * paths.size());
  for (size_t i = 0; i < paths.size(); ++i) {
    int rc = cnt_png_to_input(paths[i].c_str(), uint32_t(h), uint32_t(w),
                              dtype_code, out.data() + i * frame);
    if (rc != 0)
      Die(paths[i] + ": " + cnt_png_error(rc) +
          " (image must be an 8-bit PNG of exactly " + std::to_string(h) +
          "x" + std::to_string(w) + ")");
  }
  return out;
}

// True when the manifest declares the producer-stacked signature: ONE
// (K, H, W, 3) input taking K decoded frames.
bool IsStackedPngSignature(const std::vector<Shape>& in_shapes,
                           size_t num_pngs) {
  return in_shapes.size() == 1 && in_shapes[0].dims.size() == 4 &&
         in_shapes[0].dims[3] == 3 && num_pngs > 1 &&
         in_shapes[0].dims[0] == static_cast<int64_t>(num_pngs);
}

void AwaitAndDestroyEvent(PJRT_Event* ev, const char* what) {
  if (!ev) return;
  PJRT_Event_Await_Args eargs;
  std::memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  eargs.event = ev;
  Check(g_api->PJRT_Event_Await(&eargs), what);
  PJRT_Event_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  g_api->PJRT_Event_Destroy(&d);
}

PJRT_Buffer* UploadInput(PJRT_Client* client, PJRT_Device* device,
                         const Shape& s, const char* data) {
  size_t itemsize;
  PJRT_Buffer_Type type = DtypeToPjrt(s.dtype, &itemsize);
  PJRT_Client_BufferFromHostBuffer_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = client;
  args.data = data;
  args.type = type;
  args.dims = s.dims.data();
  args.num_dims = s.dims.size();
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  args.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&args),
        "PJRT_Client_BufferFromHostBuffer");
  AwaitAndDestroyEvent(args.done_with_host_buffer, "await h2d");
  return args.buffer;
}

void DestroyBuffer(PJRT_Buffer* b) {
  if (!b) return;
  PJRT_Buffer_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = b;
  g_api->PJRT_Buffer_Destroy(&d);
}

// D2H readback as DENSE ROW-MAJOR host bytes (explicit host_layout: the
// device layout is channel-major on the TPU backend — a silent transpose
// for C>1 outputs without this).
std::vector<char> ReadOutputDense(PJRT_Buffer* b, std::string* dtype,
                                  std::vector<int64_t>* dims) {
  PJRT_Buffer_Dimensions_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  dargs.buffer = b;
  Check(g_api->PJRT_Buffer_Dimensions(&dargs), "Buffer_Dimensions");
  dims->assign(dargs.dims, dargs.dims + dargs.num_dims);

  PJRT_Buffer_ElementType_Args targs;
  std::memset(&targs, 0, sizeof(targs));
  targs.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
  targs.buffer = b;
  Check(g_api->PJRT_Buffer_ElementType(&targs), "Buffer_ElementType");
  switch (targs.type) {
    case PJRT_Buffer_Type_F32: *dtype = "float32"; break;
    case PJRT_Buffer_Type_BF16: *dtype = "bfloat16"; break;
    case PJRT_Buffer_Type_F16: *dtype = "float16"; break;
    case PJRT_Buffer_Type_S32: *dtype = "int32"; break;
    case PJRT_Buffer_Type_U8: *dtype = "uint8"; break;
    default: *dtype = "unknown"; break;
  }

  std::vector<int64_t> m2m(dargs.num_dims);
  for (size_t di = 0; di < dargs.num_dims; ++di)
    m2m[di] = static_cast<int64_t>(dargs.num_dims - 1 - di);
  PJRT_Buffer_MemoryLayout layout;
  std::memset(&layout, 0, sizeof(layout));
  layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  layout.tiled.minor_to_major = m2m.data();
  layout.tiled.minor_to_major_size = m2m.size();
  PJRT_Buffer_ToHostBuffer_Args th;
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = b;
  th.host_layout = &layout;
  Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "d2h size");
  std::vector<char> host(th.dst_size);
  th.dst = host.data();
  Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "d2h read");
  AwaitAndDestroyEvent(th.event, "await d2h");
  return host;
}

// One synchronous execute; outputs land in `outputs` (caller destroys).
void ExecuteOnce(PJRT_LoadedExecutable* exec,
                 std::vector<PJRT_Buffer*>& inputs,
                 std::vector<PJRT_Buffer*>& outputs) {
  PJRT_ExecuteOptions exec_opts;
  std::memset(&exec_opts, 0, sizeof(exec_opts));
  exec_opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer* const* input_list = inputs.data();
  PJRT_LoadedExecutable_Execute_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  args.executable = exec;
  args.options = &exec_opts;
  args.argument_lists = &input_list;
  args.num_devices = 1;
  args.num_args = inputs.size();
  args.output_lists = &output_list;
  PJRT_Event* done = nullptr;
  args.device_complete_events = &done;
  Check(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute");
  AwaitAndDestroyEvent(done, "await execute");
}

// The --serve daemon loop (see the usage comment at the top of the file).
[[noreturn]] void ServeLoop(PJRT_Client* client, PJRT_Device* device,
                            PJRT_LoadedExecutable* exec,
                            const std::vector<Shape>& in_shapes,
                            size_t num_outputs) {
  auto err = [](const std::string& msg) {
    std::printf("ERR %s\n", msg.c_str());
    std::fflush(stdout);
    std::exit(1);
  };
  std::printf("READY %zu %zu\n", in_shapes.size(), num_outputs);
  std::fflush(stdout);
  std::string line;
  size_t requests = 0;
  while (std::getline(std::cin, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (line == "QUIT") break;
    std::vector<std::vector<char>> host_in;
    if (line == "INFER") {
      for (const Shape& s : in_shapes) {
        size_t itemsize;
        DtypeToPjrt(s.dtype, &itemsize);
        size_t n = itemsize;
        for (int64_t d : s.dims) n *= static_cast<size_t>(d);
        std::vector<char> buf(n);
        std::cin.read(buf.data(), static_cast<std::streamsize>(n));
        if (static_cast<size_t>(std::cin.gcount()) != n)
          err("short read: expected " + std::to_string(n) + " bytes");
        host_in.push_back(std::move(buf));
      }
    } else if (line.rfind("PNGS ", 0) == 0) {
      std::vector<std::string> paths;
      std::stringstream ss(line.substr(5));
      std::string tok;
      while (std::getline(ss, tok, ',')) paths.push_back(tok);
      if (IsStackedPngSignature(in_shapes, paths.size())) {
        host_in.push_back(PngsToStackedInput(paths, in_shapes[0]));
      } else if (paths.size() != in_shapes.size()) {
        err("PNGS count != manifest input count");
      } else {
        for (size_t ii = 0; ii < in_shapes.size(); ++ii) {
          const Shape& s = in_shapes[ii];
          if (s.dims.size() != 4 || s.dims[0] != 1 || s.dims[3] != 3)
            err("PNGS expects (1, H, W, 3) image inputs");
          host_in.push_back(
              PngToInput(paths[ii], s.dims[1], s.dims[2], s.dtype));
        }
      }
    } else {
      err("unknown request '" + line + "'");
    }

    std::vector<PJRT_Buffer*> inputs;
    for (size_t ii = 0; ii < in_shapes.size(); ++ii)
      inputs.push_back(
          UploadInput(client, device, in_shapes[ii], host_in[ii].data()));
    std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
    ExecuteOnce(exec, inputs, outputs);
    for (PJRT_Buffer* b : inputs) DestroyBuffer(b);

    std::printf("OK %zu\n", num_outputs);
    for (PJRT_Buffer* b : outputs) {
      std::string dtype;
      std::vector<int64_t> dims;
      std::vector<char> host = ReadOutputDense(b, &dtype, &dims);
      std::printf("OUT %s %zu", dtype.c_str(), dims.size());
      for (int64_t d : dims) std::printf(" %lld", (long long)d);
      std::printf(" %zu\n", host.size());
      std::fwrite(host.data(), 1, host.size(), stdout);
      DestroyBuffer(b);
    }
    std::fflush(stdout);
    ++requests;
  }
  std::fprintf(stderr, "[pjrt_runner] serve: %zu request(s) handled\n",
               requests);
  std::exit(0);
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin_path, model_path, inputs_arg, dump_dir, cache_dir;
  std::string pngs_arg;
  bool serve = false;
  int iters = 10;
  std::vector<std::pair<std::string, std::string>> opts;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Die("missing value after " + a);
      return argv[++i];
    };
    if (a == "--plugin") plugin_path = next();
    else if (a == "--model") model_path = next();
    else if (a == "--iters") iters = std::stoi(next());
    else if (a == "--inputs") inputs_arg = next();
    else if (a == "--pngs") pngs_arg = next();
    else if (a == "--dump-outputs") dump_dir = next();
    else if (a == "--cache") cache_dir = next();
    else if (a == "--serve") serve = true;
    else if (a == "--opt") {
      std::string kv = next();
      size_t eq = kv.find('=');
      if (eq == std::string::npos) Die("--opt expects key=value");
      opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else Die("unknown flag " + a);
  }
  if (plugin_path.empty() || model_path.empty())
    Die("usage: pjrt_runner --plugin <pjrt_plugin.so> --model <export_dir> "
        "[--iters N] [--opt k=v ...] [--inputs a.bin,...] "
        "[--pngs a.png,b.png,...] [--dump-outputs DIR] [--cache DIR] "
        "[--serve]");
  std::vector<std::string> input_files, png_files;
  if (!inputs_arg.empty()) {
    std::stringstream ss(inputs_arg);
    std::string tok;
    while (std::getline(ss, tok, ',')) input_files.push_back(tok);
  }
  if (!pngs_arg.empty()) {
    if (!inputs_arg.empty()) Die("--inputs and --pngs are exclusive");
    std::stringstream ss(pngs_arg);
    std::string tok;
    while (std::getline(ss, tok, ',')) png_files.push_back(tok);
  }

  // ---- load plugin ----
  void* handle = dlopen(plugin_path.c_str(), RTLD_LAZY | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  g_api = get_api();
  if (!g_api) Die("GetPjrtApi returned null");
  std::fprintf(stderr, "[pjrt_runner] plugin api version %d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  {
    PJRT_Plugin_Initialize_Args args;
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    Check(g_api->PJRT_Plugin_Initialize(&args), "PJRT_Plugin_Initialize");
  }

  // ---- named options ----
  std::vector<PJRT_NamedValue> named;
  std::vector<int64_t> int_storage(opts.size());
  for (size_t i = 0; i < opts.size(); ++i) {
    PJRT_NamedValue v;
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.extension_start = nullptr;
    v.name = opts[i].first.c_str();
    v.name_size = opts[i].first.size();
    char* endp = nullptr;
    long long as_int = strtoll(opts[i].second.c_str(), &endp, 10);
    if (endp && *endp == '\0' && !opts[i].second.empty()) {
      int_storage[i] = as_int;
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = int_storage[i];
      v.value_size = 1;
    } else {
      v.type = PJRT_NamedValue_kString;
      v.string_value = opts[i].second.c_str();
      v.value_size = opts[i].second.size();
    }
    named.push_back(v);
  }

  // ---- client ----
  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = named.empty() ? nullptr : named.data();
    args.num_options = named.size();
    Check(g_api->PJRT_Client_Create(&args), "PJRT_Client_Create");
    client = args.client;
  }

  // ---- devices ----
  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dev_args),
        "PJRT_Client_AddressableDevices");
  if (dev_args.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::fprintf(stderr, "[pjrt_runner] %zu addressable device(s)\n",
               dev_args.num_addressable_devices);

  // ---- compile (or load from the serialized-executable cache) ----
  std::string mlir = ReadFile(model_path + "/model.mlir");
  std::string manifest = ReadFile(model_path + "/manifest.json");
  std::vector<Shape> in_shapes = ParseManifestInputs(manifest);

  // Serialized xla.CompileOptionsProto (exported alongside the model by
  // cerberusnet_tpu.export; empty options would default to 0 replicas).
  std::string copts;
  {
    std::ifstream f(model_path + "/compile_options.pb", std::ios::binary);
    if (f) {
      std::ostringstream ss;
      ss << f.rdbuf();
      copts = ss.str();
    }
  }

  std::string cache_path;
  if (!cache_dir.empty()) {
    // Key the cache on platform identity + program + options: the PJRT
    // serialization format is platform-specific and not stable over time.
    std::string platform;
    {
      PJRT_Client_PlatformName_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
      args.client = client;
      Check(g_api->PJRT_Client_PlatformName(&args), "PlatformName");
      platform.assign(args.platform_name, args.platform_name_size);
    }
    {
      PJRT_Client_PlatformVersion_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Client_PlatformVersion_Args_STRUCT_SIZE;
      args.client = client;
      Check(g_api->PJRT_Client_PlatformVersion(&args), "PlatformVersion");
      platform.append("/");
      platform.append(args.platform_version, args.platform_version_size);
    }
    uint64_t key = Fnv1a(copts, Fnv1a(mlir, Fnv1a(platform)));
    char hex[17];
    std::snprintf(hex, sizeof(hex), "%016llx",
                  static_cast<unsigned long long>(key));
    mkdir(cache_dir.c_str(), 0755);
    cache_path = cache_dir + "/" + hex + ".pjrt_exec";
  }

  PJRT_LoadedExecutable* exec = nullptr;
  bool cached = false;
  auto t_compile0 = std::chrono::steady_clock::now();
  if (!cache_path.empty()) {
    std::ifstream f(cache_path, std::ios::binary);
    if (f) {
      std::ostringstream ss;
      ss << f.rdbuf();
      std::string blob = ss.str();
      PJRT_Executable_DeserializeAndLoad_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
      args.client = client;
      args.serialized_executable = blob.data();
      args.serialized_executable_size = blob.size();
      if (TryCheck(g_api->PJRT_Executable_DeserializeAndLoad(&args),
                   "DeserializeAndLoad")) {
        exec = args.loaded_executable;
        cached = true;
        std::fprintf(stderr, "[pjrt_runner] loaded cached executable %s\n",
                     cache_path.c_str());
      }
    }
  }
  if (exec == nullptr) {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(mlir.data());
    program.code_size = mlir.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;
    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &program;
    args.compile_options = copts.empty() ? nullptr : copts.data();
    args.compile_options_size = copts.size();
    Check(g_api->PJRT_Client_Compile(&args), "PJRT_Client_Compile");
    exec = args.executable;
  }
  double compile_ms =
      std::chrono::duration<double, std::milli>(
          std::chrono::steady_clock::now() - t_compile0)
          .count();

  // ---- input buffers (zero-filled, or loaded from --inputs files) ----
  if (!input_files.empty() && input_files.size() != in_shapes.size())
    Die("--inputs count != manifest input count");
  bool stacked_pngs =
      !png_files.empty() && IsStackedPngSignature(in_shapes, png_files.size());
  if (!png_files.empty() && !stacked_pngs &&
      png_files.size() != in_shapes.size())
    Die("--pngs count != manifest input count");
  std::vector<PJRT_Buffer*> inputs;
  std::vector<std::vector<char>> host_data;
  for (size_t ii = 0; ii < in_shapes.size(); ++ii) {
    const Shape& s = in_shapes[ii];
    size_t itemsize;
    PJRT_Buffer_Type type = DtypeToPjrt(s.dtype, &itemsize);
    size_t n = itemsize;
    for (int64_t d : s.dims) n *= static_cast<size_t>(d);
    if (stacked_pngs) {
      std::vector<char> px = PngsToStackedInput(png_files, s);
      if (px.size() != n) Die("internal: stacked png tensor size mismatch");
      host_data.push_back(std::move(px));
    } else if (!png_files.empty()) {
      if (s.dims.size() != 4 || s.dims[0] != 1 || s.dims[3] != 3)
        Die("--pngs expects (1, H, W, 3) image inputs");
      std::vector<char> px =
          PngToInput(png_files[ii], s.dims[1], s.dims[2], s.dtype);
      if (px.size() != n) Die("internal: png tensor size mismatch");
      host_data.push_back(std::move(px));
    } else if (!input_files.empty()) {
      std::string raw = ReadFile(input_files[ii]);
      if (raw.size() != n)
        Die("input " + input_files[ii] + " has " +
            std::to_string(raw.size()) + " bytes, expected " +
            std::to_string(n));
      host_data.emplace_back(raw.begin(), raw.end());
    } else {
      host_data.emplace_back(n, 0);
    }
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host_data.back().data();
    args.type = type;
    args.dims = s.dims.data();
    args.num_dims = s.dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    Check(g_api->PJRT_Client_BufferFromHostBuffer(&args),
          "PJRT_Client_BufferFromHostBuffer");
    if (args.done_with_host_buffer) {
      PJRT_Event_Await_Args eargs;
      std::memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      eargs.event = args.done_with_host_buffer;
      Check(g_api->PJRT_Event_Await(&eargs), "await h2d");
      PJRT_Event_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      d.event = args.done_with_host_buffer;
      g_api->PJRT_Event_Destroy(&d);
    }
    inputs.push_back(args.buffer);
  }

  // ---- execute ----
  PJRT_ExecuteOptions exec_opts;
  std::memset(&exec_opts, 0, sizeof(exec_opts));
  exec_opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Executable* plain_exec = nullptr;
  {
    PJRT_LoadedExecutable_GetExecutable_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    args.loaded_executable = exec;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&args), "GetExecutable");
    plain_exec = args.executable;
  }
  // ---- populate the executable cache (TRT serialize-engine analogue) ----
  if (!cached && !cache_path.empty()) {
    PJRT_Executable_Serialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Executable_Serialize_Args_STRUCT_SIZE;
    args.executable = plain_exec;
    if (TryCheck(g_api->PJRT_Executable_Serialize(&args),
                 "Executable_Serialize")) {
      std::string tmp = cache_path + ".tmp";
      std::ofstream f(tmp, std::ios::binary);
      if (f) {
        f.write(args.serialized_bytes,
                static_cast<std::streamsize>(args.serialized_bytes_size));
        f.close();
        if (std::rename(tmp.c_str(), cache_path.c_str()) == 0)
          std::fprintf(stderr,
                       "[pjrt_runner] cached executable (%zu bytes) -> %s\n",
                       args.serialized_bytes_size, cache_path.c_str());
        else
          std::remove(tmp.c_str());
      }
      if (args.serialized_executable_deleter)
        args.serialized_executable_deleter(args.serialized_executable);
    }
  }

  size_t num_outputs = 0;
  {
    PJRT_Executable_NumOutputs_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    args.executable = plain_exec;
    Check(g_api->PJRT_Executable_NumOutputs(&args), "NumOutputs");
    num_outputs = args.num_outputs;
  }

  if (serve) {
    std::fprintf(stderr,
                 "[pjrt_runner] entering serve loop (compile %.1f ms, "
                 "cached=%s)\n",
                 compile_ms, cached ? "true" : "false");
    ServeLoop(client, device, exec, in_shapes, num_outputs);
  }

  std::vector<PJRT_Buffer*> output_storage(num_outputs, nullptr);
  double total_ms = 0.0;
  for (int it = 0; it < iters + 1; ++it) {  // first iter = warmup
    PJRT_Buffer** output_list = output_storage.data();
    PJRT_Buffer* const* input_list = inputs.data();
    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &exec_opts;
    args.argument_lists = &input_list;
    args.num_devices = 1;
    args.num_args = inputs.size();
    args.output_lists = &output_list;
    PJRT_Event* done = nullptr;
    args.device_complete_events = &done;
    auto t0 = std::chrono::steady_clock::now();
    Check(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute");
    if (done) {
      PJRT_Event_Await_Args eargs;
      std::memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      eargs.event = done;
      Check(g_api->PJRT_Event_Await(&eargs), "await execute");
      PJRT_Event_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      d.event = done;
      g_api->PJRT_Event_Destroy(&d);
    }
    // Force completion: the device_complete event on async backends can
    // fire at enqueue; a D2H readback of one output cannot.
    if (output_storage[0]) {
      PJRT_Buffer_ToHostBuffer_Args th;
      std::memset(&th, 0, sizeof(th));
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = output_storage[0];
      th.dst = nullptr;  // size query
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer size");
      std::vector<char> host(th.dst_size);
      th.dst = host.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
      if (th.event) {
        PJRT_Event_Await_Args eargs;
        std::memset(&eargs, 0, sizeof(eargs));
        eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        eargs.event = th.event;
        Check(g_api->PJRT_Event_Await(&eargs), "await d2h");
        PJRT_Event_Destroy_Args d;
        std::memset(&d, 0, sizeof(d));
        d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        d.event = th.event;
        g_api->PJRT_Event_Destroy(&d);
      }
    }
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    if (it > 0) total_ms += ms;
    // destroy outputs of all but the last iteration
    if (it < iters) {
      for (PJRT_Buffer* b : output_storage) {
        if (!b) continue;
        PJRT_Buffer_Destroy_Args d;
        std::memset(&d, 0, sizeof(d));
        d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        d.buffer = b;
        g_api->PJRT_Buffer_Destroy(&d);
      }
    }
  }

  // ---- dump the final iteration's outputs ----
  if (!dump_dir.empty()) {
    mkdir(dump_dir.c_str(), 0755);
    std::ostringstream meta;
    meta << "[";
    for (size_t oi = 0; oi < num_outputs; ++oi) {
      PJRT_Buffer* b = output_storage[oi];
      if (!b) Die("missing output buffer");
      PJRT_Buffer_Dimensions_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      dargs.buffer = b;
      Check(g_api->PJRT_Buffer_Dimensions(&dargs), "Buffer_Dimensions");
      PJRT_Buffer_ElementType_Args targs;
      std::memset(&targs, 0, sizeof(targs));
      targs.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      targs.buffer = b;
      Check(g_api->PJRT_Buffer_ElementType(&targs), "Buffer_ElementType");
      const char* dtype = "unknown";
      switch (targs.type) {
        case PJRT_Buffer_Type_F32: dtype = "float32"; break;
        case PJRT_Buffer_Type_BF16: dtype = "bfloat16"; break;
        case PJRT_Buffer_Type_F16: dtype = "float16"; break;
        case PJRT_Buffer_Type_S32: dtype = "int32"; break;
        case PJRT_Buffer_Type_U8: dtype = "uint8"; break;
        default: break;
      }
      // Request DENSE ROW-MAJOR host bytes: without an explicit host_layout
      // the runtime may deliver the device layout (observed channel-major on
      // the TPU backend — a silent transpose for C>1 outputs).
      std::vector<int64_t> m2m(dargs.num_dims);
      for (size_t di = 0; di < dargs.num_dims; ++di)
        m2m[di] = static_cast<int64_t>(dargs.num_dims - 1 - di);
      PJRT_Buffer_MemoryLayout layout;
      std::memset(&layout, 0, sizeof(layout));
      layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
      layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
      layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
      layout.tiled.minor_to_major = m2m.data();
      layout.tiled.minor_to_major_size = m2m.size();
      PJRT_Buffer_ToHostBuffer_Args th;
      std::memset(&th, 0, sizeof(th));
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = b;
      th.host_layout = &layout;
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "dump size");
      std::vector<char> host(th.dst_size);
      th.dst = host.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "dump read");
      if (th.event) {
        PJRT_Event_Await_Args eargs;
        std::memset(&eargs, 0, sizeof(eargs));
        eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        eargs.event = th.event;
        Check(g_api->PJRT_Event_Await(&eargs), "await dump d2h");
        PJRT_Event_Destroy_Args d;
        std::memset(&d, 0, sizeof(d));
        d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        d.event = th.event;
        g_api->PJRT_Event_Destroy(&d);
      }
      std::string path = dump_dir + "/output_" + std::to_string(oi) + ".bin";
      std::ofstream f(path, std::ios::binary);
      if (!f) Die("cannot write " + path);
      f.write(host.data(), static_cast<std::streamsize>(host.size()));
      if (oi) meta << ", ";
      meta << "{\"file\": \"output_" << oi << ".bin\", \"dtype\": \""
           << dtype << "\", \"shape\": [";
      for (size_t di = 0; di < dargs.num_dims; ++di) {
        if (di) meta << ", ";
        meta << dargs.dims[di];
      }
      meta << "]}";
    }
    meta << "]";
    std::ofstream mf(dump_dir + "/outputs.json");
    mf << meta.str() << "\n";
    std::fprintf(stderr, "[pjrt_runner] wrote %zu outputs to %s\n",
                 num_outputs, dump_dir.c_str());
  }

  std::printf(
      "{\"compile_ms\": %.1f, \"avg_exec_ms\": %.3f, \"iters\": %d, "
      "\"num_outputs\": %zu, \"cached\": %s}\n",
      compile_ms, total_ms / iters, iters, num_outputs,
      cached ? "true" : "false");
  return 0;
}
