// fake_pjrt_plugin: a minimal in-process PJRT plugin for hermetically
// testing native/creste_serve.cpp without device hardware.
//
// Semantics: "echo device" — Execute produces num_outputs buffers where
// output i is a byte-copy of input min(i, num_args-1), so the host's full
// buffer round-trip (H2D staging, execute, D2H readback, checksums) is
// exercised end-to-end. num_outputs comes from FAKE_PJRT_NUM_OUTPUTS
// (default 1). Compile only sanity-checks the module bytes are non-empty.
//
// Simulated latency (for testing the host's pipelined streaming phase):
// FAKE_PJRT_EXEC_MS / FAKE_PJRT_H2D_MS / FAKE_PJRT_D2H_MS (float ms,
// default 0 = instant). The device is modeled as a SERIAL execution
// queue: each Execute occupies it for EXEC_MS starting when it is free,
// and every event carries a completion deadline that EventAwait sleeps
// until. With these set, a sequential host loop pays exec+d2h per frame
// while a depth-2 pipelined loop approaches max(exec, h2d, d2h) — the
// overlap the hermetic test asserts.
#include <stdlib.h>
#include <string.h>

#include <chrono>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

using Clock = std::chrono::steady_clock;

double EnvMs(const char* name) {
  const char* v = getenv(name);
  return v ? atof(v) : 0.0;
}

Clock::duration MsDur(double ms) {
  return std::chrono::duration_cast<Clock::duration>(
      std::chrono::duration<double, std::milli>(ms));
}

struct FakeBuffer {
  std::vector<int64_t> dims;
  std::vector<uint8_t> bytes;
  Clock::time_point ready{};  // when the device has produced the data
};

struct FakeExec {
  size_t num_outputs;
};

struct FakeEventObj {
  Clock::time_point ready;
};

// Serial device queue: Execute i+1 starts when Execute i finished.
std::mutex g_dev_mu;
Clock::time_point g_device_free{};

// Opaque singletons for handles the host never dereferences.
int g_client_tag, g_device_tag;

PJRT_Event* FakeEvent(Clock::time_point ready = Clock::time_point{}) {
  return reinterpret_cast<PJRT_Event*>(new FakeEventObj{ready});
}

void ErrorDestroy(PJRT_Error_Destroy_Args*) {}
void ErrorMessage(PJRT_Error_Message_Args* a) {
  a->message = "fake error";
  a->message_size = 10;
}
PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) { return nullptr; }
PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* a) {
  delete reinterpret_cast<FakeEventObj*>(a->event);
  return nullptr;
}
PJRT_Error* EventAwait(PJRT_Event_Await_Args* a) {
  FakeEventObj* e = reinterpret_cast<FakeEventObj*>(a->event);
  if (e && e->ready != Clock::time_point{})
    std::this_thread::sleep_until(e->ready);
  return nullptr;
}

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* a) {
  a->client = reinterpret_cast<PJRT_Client*>(&g_client_tag);
  return nullptr;
}
PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args*) { return nullptr; }

PJRT_Error* AddressableDevices(PJRT_Client_AddressableDevices_Args* a) {
  static PJRT_Device* devices[1] = {
      reinterpret_cast<PJRT_Device*>(&g_device_tag)};
  a->addressable_devices = devices;
  a->num_addressable_devices = 1;
  return nullptr;
}

PJRT_Error* Compile(PJRT_Client_Compile_Args* a) {
  if (!a->program || a->program->code_size == 0) abort();
  FakeExec* e = new FakeExec;
  const char* n = getenv("FAKE_PJRT_NUM_OUTPUTS");
  e->num_outputs = n ? (size_t)atoi(n) : 1;
  a->executable = reinterpret_cast<PJRT_LoadedExecutable*>(e);
  return nullptr;
}

PJRT_Error* GetExecutable(PJRT_LoadedExecutable_GetExecutable_Args* a) {
  a->executable = reinterpret_cast<PJRT_Executable*>(a->loaded_executable);
  return nullptr;
}

PJRT_Error* NumOutputs(PJRT_Executable_NumOutputs_Args* a) {
  a->num_outputs = reinterpret_cast<FakeExec*>(a->executable)->num_outputs;
  return nullptr;
}

PJRT_Error* BufferFromHostBuffer(PJRT_Client_BufferFromHostBuffer_Args* a) {
  FakeBuffer* b = new FakeBuffer;
  b->dims.assign(a->dims, a->dims + a->num_dims);
  int64_t elems = 1;
  for (int64_t d : b->dims) elems *= d;
  size_t width = 1;
  switch (a->type) {
    case PJRT_Buffer_Type_F32:
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32:
      width = 4;
      break;
    case PJRT_Buffer_Type_BF16:
    case PJRT_Buffer_Type_F16:
      width = 2;
      break;
    default:
      width = 1;
  }
  const uint8_t* src = static_cast<const uint8_t*>(a->data);
  b->bytes.assign(src, src + elems * width);
  Clock::time_point staged = Clock::now() + MsDur(EnvMs("FAKE_PJRT_H2D_MS"));
  b->ready = staged;
  a->done_with_host_buffer = FakeEvent(staged);
  a->buffer = reinterpret_cast<PJRT_Buffer*>(b);
  return nullptr;
}

PJRT_Error* Execute(PJRT_LoadedExecutable_Execute_Args* a) {
  FakeExec* e = reinterpret_cast<FakeExec*>(a->executable);
  // serial device: this execution starts when the device frees up and
  // occupies it for FAKE_PJRT_EXEC_MS
  Clock::time_point done;
  {
    std::lock_guard<std::mutex> lk(g_dev_mu);
    Clock::time_point start = Clock::now();
    if (g_device_free > start) start = g_device_free;
    done = start + MsDur(EnvMs("FAKE_PJRT_EXEC_MS"));
    g_device_free = done;
  }
  for (size_t o = 0; o < e->num_outputs; ++o) {
    size_t src_i = a->num_args ? (o < a->num_args ? o : a->num_args - 1) : 0;
    FakeBuffer* out = new FakeBuffer;
    if (a->num_args) {
      FakeBuffer* in =
          reinterpret_cast<FakeBuffer*>(a->argument_lists[0][src_i]);
      *out = *in;
    } else {
      out->dims = {1};
      out->bytes = {0};
    }
    out->ready = done;
    a->output_lists[0][o] = reinterpret_cast<PJRT_Buffer*>(out);
  }
  if (a->device_complete_events)
    a->device_complete_events[0] = FakeEvent(done);
  return nullptr;
}

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* a) {
  delete reinterpret_cast<FakeBuffer*>(a->buffer);
  return nullptr;
}

PJRT_Error* BufferDimensions(PJRT_Buffer_Dimensions_Args* a) {
  FakeBuffer* b = reinterpret_cast<FakeBuffer*>(a->buffer);
  a->dims = b->dims.data();
  a->num_dims = b->dims.size();
  return nullptr;
}

PJRT_Error* BufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* a) {
  FakeBuffer* b = reinterpret_cast<FakeBuffer*>(a->src);
  if (!a->dst) {
    a->dst_size = b->bytes.size();
    return nullptr;
  }
  memcpy(a->dst, b->bytes.data(), b->bytes.size());
  // transfer completes D2H_MS after the data exists on-device
  Clock::time_point start = Clock::now();
  if (b->ready > start) start = b->ready;
  a->event = FakeEvent(start + MsDur(EnvMs("FAKE_PJRT_D2H_MS")));
  return nullptr;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api;
  memset(&api, 0, sizeof(api));
  api.struct_size = PJRT_Api_STRUCT_SIZE;
  api.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
  api.pjrt_api_version.major_version = PJRT_API_MAJOR;
  api.pjrt_api_version.minor_version = PJRT_API_MINOR;
  api.PJRT_Error_Destroy = ErrorDestroy;
  api.PJRT_Error_Message = ErrorMessage;
  api.PJRT_Plugin_Initialize = PluginInitialize;
  api.PJRT_Event_Destroy = EventDestroy;
  api.PJRT_Event_Await = EventAwait;
  api.PJRT_Client_Create = ClientCreate;
  api.PJRT_Client_Destroy = ClientDestroy;
  api.PJRT_Client_AddressableDevices = AddressableDevices;
  api.PJRT_Client_Compile = Compile;
  api.PJRT_Client_BufferFromHostBuffer = BufferFromHostBuffer;
  api.PJRT_LoadedExecutable_GetExecutable = GetExecutable;
  api.PJRT_Executable_NumOutputs = NumOutputs;
  api.PJRT_LoadedExecutable_Execute = Execute;
  api.PJRT_Buffer_Destroy = BufferDestroy;
  api.PJRT_Buffer_Dimensions = BufferDimensions;
  api.PJRT_Buffer_ToHostBuffer = BufferToHostBuffer;
  return &api;
}
