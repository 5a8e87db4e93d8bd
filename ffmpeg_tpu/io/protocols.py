"""Network/stream protocols (reference: libavformat/tcp.c, http.c, udp.c).

The host runtime owns IO; protocols expose file-like read objects consumed
by avio.Reader. Built on the stdlib so they work in hermetic environments:
http(s) via http.client, tcp/udp via socket. Redirects and range-based
reconnects follow the reference's http semantics."""

from __future__ import annotations

import io
import socket
from typing import Optional
from urllib.parse import urlparse

from ..utils.error import InvalidData, ProtocolNotFound


class _SocketFile:
    """Minimal file-like over a connected socket (tcp.c analog)."""

    def __init__(self, sock: socket.socket):
        self._s = sock
        self._f = sock.makefile("rb")

    def read(self, n: int = -1) -> bytes:
        return self._f.read(n)

    def close(self) -> None:
        try:
            self._f.close()
        finally:
            self._s.close()


def open_tcp(url: str, timeout: float = 10.0) -> _SocketFile:
    u = urlparse(url)
    if not u.hostname or not u.port:
        raise InvalidData(f"tcp: need host:port in {url!r}")
    s = socket.create_connection((u.hostname, u.port), timeout=timeout)
    return _SocketFile(s)


def open_tls(url: str, timeout: float = 10.0):
    """tls://host:port — TCP wrapped in TLS (reference: tls.c).
    Query options: ?verify=0 disables certificate verification
    (the reference's tls 'verify' AVOption, default off like ffmpeg)."""
    import ssl
    u = urlparse(url)
    if not u.hostname or not u.port:
        raise InvalidData(f"tls: need host:port in {url!r}")
    verify = "verify=1" in (u.query or "")
    ctx = ssl.create_default_context()
    if not verify:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    raw = socket.create_connection((u.hostname, u.port), timeout=timeout)
    s = ctx.wrap_socket(raw, server_hostname=u.hostname)
    return _SocketFile(s)


class UdpStream:
    """udp://host:port datagram reader (reference: udp.c). For reading,
    binds the port and returns datagram payloads packet-at-a-time; a
    read(n) returns at most one datagram (like the reference's
    packetized mode)."""

    def __init__(self, url: str, timeout: float = 10.0):
        u = urlparse(url)
        if u.port is None:
            raise InvalidData(f"udp: need port in {url!r}")
        self._s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._s.settimeout(timeout)
        self._s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._s.bind((u.hostname or "0.0.0.0", u.port))
        self._pending = b""

    def read(self, n: int = -1) -> bytes:
        if self._pending:
            if n < 0:
                out, self._pending = self._pending, b""
            else:
                out, self._pending = self._pending[:n], self._pending[n:]
            return out
        try:
            data = self._s.recv(65536)
        except socket.timeout:
            return b""
        if 0 <= n < len(data):
            self._pending = data[n:]
            return data[:n]
        return data

    def close(self) -> None:
        self._s.close()


class HttpStream:
    """http/https GET body as a file-like, with redirect following and
    Range-based seek support when the server advertises it (http.c:
    http_open + http_seek)."""

    MAX_REDIRECTS = 8

    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout
        self._resp = None
        self._conn = None
        self._pos = 0
        self.size: Optional[int] = None
        self.accept_ranges = False
        self._open(0)

    def _open(self, offset: int) -> None:
        import http.client
        url = self.url
        for _ in range(self.MAX_REDIRECTS):
            u = urlparse(url)
            cls = http.client.HTTPSConnection if u.scheme == "https" \
                else http.client.HTTPConnection
            conn = cls(u.hostname, u.port, timeout=self.timeout)
            path = u.path or "/"
            if u.query:
                path += "?" + u.query
            headers = {"User-Agent": "fftpu/0.1", "Accept": "*/*"}
            if offset:
                headers["Range"] = f"bytes={offset}-"
            conn.request("GET", path, headers=headers)
            resp = conn.getresponse()
            if resp.status in (301, 302, 303, 307, 308):
                loc = resp.getheader("Location")
                resp.read()
                conn.close()
                if not loc:
                    raise InvalidData("http: redirect without Location")
                from urllib.parse import urljoin
                url = urljoin(url, loc)
                continue
            if resp.status not in (200, 206):
                conn.close()
                raise InvalidData(f"http: status {resp.status} for {url}")
            if offset and resp.status == 200:
                # Server ignored the Range request and is sending the whole
                # body from byte 0 (http.c treats this as a full-resource
                # response): consume up to `offset` so reads line up.
                skip = offset
                while skip > 0:
                    chunk = resp.read(min(skip, 1 << 16))
                    if not chunk:
                        conn.close()
                        raise InvalidData(
                            "http: body ended before requested offset")
                    skip -= len(chunk)
            self._conn, self._resp = conn, resp
            self._pos = offset
            self.accept_ranges = (resp.status == 206 or
                                  resp.getheader("Accept-Ranges") == "bytes")
            cl = resp.getheader("Content-Length")
            if cl is not None and self.size is None:
                # 206: length of the remainder; 200: the full resource.
                self.size = int(cl) + (offset if resp.status == 206 else 0)
            cr = resp.getheader("Content-Range")
            if cr and "/" in cr:
                total = cr.rsplit("/", 1)[1]
                if total.isdigit():
                    self.size = int(total)
            return
        raise InvalidData("http: too many redirects")

    def read(self, n: int = -1) -> bytes:
        data = self._resp.read(n if n is not None and n >= 0 else None)
        self._pos += len(data)
        return data

    def tell(self) -> int:
        return self._pos

    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 1:
            pos += self._pos
        elif whence == 2:
            if self.size is None:
                raise io.UnsupportedOperation("http: unknown size")
            pos += self.size
        if pos == self._pos:
            return pos
        if not self.accept_ranges:
            raise io.UnsupportedOperation("http: server has no range support")
        self._resp.close()
        self._conn.close()
        self._open(pos)
        return pos

    def close(self) -> None:
        try:
            if self._resp is not None:
                self._resp.close()
        finally:
            if self._conn is not None:
                self._conn.close()


def open_url(url: str):
    """Resolve a protocol URL to a file-like (ffurl_open analog). Returns
    None for protocols avio handles natively (file/pipe/fd/memory)."""
    scheme = url.split("://", 1)[0] if "://" in url else ""
    if scheme in ("http", "https"):
        return HttpStream(url)
    if scheme == "tcp":
        return open_tcp(url)
    if scheme == "tls":
        return open_tls(url)
    if scheme == "udp":
        return UdpStream(url)
    if scheme == "rtmp":
        from .rtmp import RtmpReadStream
        return RtmpReadStream(url)
    if scheme:
        raise ProtocolNotFound(f"protocol {scheme!r} not supported")
    return None


def open_url_write(url: str):
    """Writable protocol endpoint (ffurl_open WRITE analog); None for
    protocols avio handles natively."""
    scheme = url.split("://", 1)[0] if "://" in url else ""
    if scheme == "rtmp":
        from .rtmp import RtmpWriteStream
        return RtmpWriteStream(url)
    return None


def protocol_names():
    return ["file", "pipe", "fd", "memory", "http", "https", "tcp",
            "tls", "udp", "rtmp"]
