"""ctypes binding for the native C++ LCM-UDPM transport
(native/lcm_transport.cpp).  Builds the shared library on first use via
the Makefile; falls back to the pure-python transport when the toolchain
is unavailable."""
import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblcm_transport.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lcmt_create.restype = ctypes.c_void_p
    lib.lcmt_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_int]
    lib.lcmt_publish.restype = ctypes.c_int
    lib.lcmt_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_char_p, ctypes.c_int]
    lib.lcmt_poll.restype = ctypes.c_int
    lib.lcmt_poll.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                              ctypes.c_double]
    lib.lcmt_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeUDPMulticast:
    """Same interface as comms.udpm.UDPMulticast, backed by the C++
    transport."""

    def __init__(self, addr=("239.255.76.67", 7667), ttl=0):
        lib = _load()
        self.lib = lib
        self.h = lib.lcmt_create(addr[0].encode(), addr[1], ttl)
        if not self.h:
            raise OSError("native transport init failed")
        self.handlers = {}
        self._chan_buf = ctypes.create_string_buffer(256)
        self._buf = ctypes.create_string_buffer(4 * 1024 * 1024)

    def publish(self, channel, payload):
        data = bytes(payload)
        rc = self.lib.lcmt_publish(self.h, channel.encode(), data,
                                   len(data))
        if rc != 0:
            raise OSError("publish failed")

    def subscribe(self, channel, handler):
        self.handlers.setdefault(channel, []).append(handler)

    def handle(self, timeout=0.1):
        n = self.lib.lcmt_poll(self.h, self._chan_buf, 256, self._buf,
                               len(self._buf), timeout)
        if n < 0:
            return False
        channel = self._chan_buf.value.decode()
        data = self._buf.raw[:n]
        for h in self.handlers.get(channel, []):
            h(channel, data)
        return True

    def close(self):
        if self.h:
            self.lib.lcmt_destroy(self.h)
            self.h = None
