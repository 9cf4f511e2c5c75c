"""LCM-UDPM transport: UDP-multicast pub/sub with the LCM datagram
framing (short LC02 + fragmented LC03 messages).

Default endpoint mirrors the reference (common/utilities.h:303-306):
udpm://239.255.76.67:7667?ttl=255.  A native C++ transport with the same
framing lives in native/ (loaded via ctypes when built); this pure-python
implementation is the fallback and the test path.
"""
import select
import socket
import struct
import threading

MAGIC_SHORT = 0x4C433032   # "LC02"
MAGIC_LONG = 0x4C433033    # "LC03"
FRAGMENT_SIZE = 60000
DEFAULT_ADDR = ("239.255.76.67", 7667)


class UDPMulticast:
    def __init__(self, addr=DEFAULT_ADDR, ttl=0):
        self.addr = addr
        self.seq = 0
        self.tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, ttl)
        self.tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
        self.rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.rx.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                           8 * 1024 * 1024)
        self.rx.bind(("", addr[1]))
        mreq = struct.pack("4sl", socket.inet_aton(addr[0]),
                           socket.INADDR_ANY)
        self.rx.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP,
                           mreq)
        self.handlers = {}
        self._frags = {}
        self._lock = threading.Lock()

    # ---------------- publish -------------------------------------
    def publish(self, channel, payload):
        if isinstance(payload, (bytes, bytearray)):
            data = bytes(payload)
        else:
            data = payload.encode()
        chan = channel.encode() + b"\x00"
        with self._lock:
            seq = self.seq
            self.seq += 1
        if len(chan) + len(data) + 8 <= FRAGMENT_SIZE:
            pkt = struct.pack(">II", MAGIC_SHORT, seq) + chan + data
            self.tx.sendto(pkt, self.addr)
            return
        # fragmented (LC03): header + channel on fragment 0
        n_frag = 0
        off = 0
        sizes = []
        first_max = FRAGMENT_SIZE - 20 - len(chan)
        sizes.append(min(first_max, len(data)))
        off = sizes[0]
        while off < len(data):
            sizes.append(min(FRAGMENT_SIZE - 20, len(data) - off))
            off += sizes[-1]
        n_frag = len(sizes)
        off = 0
        for i, sz in enumerate(sizes):
            hdr = struct.pack(">IIIIHH", MAGIC_LONG, seq, len(data), off,
                              i, n_frag)
            body = data[off:off + sz]
            pkt = hdr + (chan if i == 0 else b"") + body
            self.tx.sendto(pkt, self.addr)
            off += sz

    # ---------------- subscribe -----------------------------------
    def subscribe(self, channel, handler):
        self.handlers.setdefault(channel, []).append(handler)

    def handle(self, timeout=0.1):
        """Poll once; dispatch at most one complete message."""
        r, _, _ = select.select([self.rx], [], [], timeout)
        if not r:
            return False
        pkt, src = self.rx.recvfrom(65535)
        return self._process(pkt, src)

    def _process(self, pkt, src):
        (magic,) = struct.unpack_from(">I", pkt, 0)
        if magic == MAGIC_SHORT:
            end = pkt.index(b"\x00", 8)
            channel = pkt[8:end].decode()
            self._dispatch(channel, pkt[end + 1:])
            return True
        if magic == MAGIC_LONG:
            seq, msg_sz, frag_off, frag_no, n_frag = struct.unpack_from(
                ">IIIHH", pkt, 4)
            key = (src, seq)
            body = pkt[20:]
            if frag_no == 0:
                end = body.index(b"\x00")
                channel = body[:end].decode()
                body = body[end + 1:]
                st = self._frags.setdefault(
                    key, [channel, bytearray(msg_sz), 0])
                st[0] = channel
            else:
                st = self._frags.setdefault(key, [None, bytearray(msg_sz),
                                                  0])
            st[1][frag_off:frag_off + len(body)] = body
            st[2] += 1
            if st[2] == n_frag and st[0] is not None:
                self._dispatch(st[0], bytes(st[1]))
                del self._frags[key]
                return True
            return False
        return False

    def _dispatch(self, channel, data):
        for h in self.handlers.get(channel, []):
            h(channel, data)

    def close(self):
        self.tx.close()
        self.rx.close()


class LCMEndpoint:
    """Typed pub/sub: publish(channel, msg) / subscribe(channel, type, cb).
    The functional analogue of the reference's lcm::LCM usage."""

    def __init__(self, transport=None):
        self.t = transport or UDPMulticast()

    def publish(self, channel, msg):
        self.t.publish(channel, msg.encode())

    def subscribe(self, channel, msg_type, callback):
        def h(chan, data):
            callback(chan, msg_type.decode(data))
        self.t.subscribe(channel, h)

    def handle(self, timeout=0.1):
        return self.t.handle(timeout)

    def close(self):
        self.t.close()
