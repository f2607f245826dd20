"""Minimal threaded FTP stub server for tests (stdlib sockets only).

Supports exactly what sources/ftp.py exercises: USER/PASS login, TYPE,
PWD, CWD, PASV, NLST, SIZE, RETR, QUIT. Files are an in-memory dict of
posix paths -> bytes; directories are implied by the paths.
"""

from __future__ import annotations

import posixpath
import socket
import threading


class FtpStub:
    def __init__(self, files: dict[str, bytes]):
        self.files = {"/" + k.lstrip("/"): v for k, v in files.items()}
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    # -- tree helpers -------------------------------------------------------
    def _is_dir(self, path: str) -> bool:
        p = path.rstrip("/") or "/"
        if p == "/":
            return True
        prefix = p + "/"
        return any(f.startswith(prefix) for f in self.files)

    def _names_in(self, path: str) -> list[str]:
        p = path.rstrip("/") or "/"
        prefix = "/" if p == "/" else p + "/"
        names = set()
        for f in self.files:
            if f.startswith(prefix):
                names.add(f[len(prefix):].split("/")[0])
        return sorted(names)

    # -- lifecycle ----------------------------------------------------------
    def __enter__(self) -> "FtpStub":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    # -- one control session -------------------------------------------------
    def _handle(self, conn: socket.socket) -> None:
        cwd = "/"
        data_srv: socket.socket | None = None

        def send(line: str) -> None:
            conn.sendall((line + "\r\n").encode())

        def open_data() -> socket.socket:
            s, _ = data_srv.accept()
            return s

        send("220 ftpstub ready")
        buf = b""
        try:
            while True:
                while b"\r\n" not in buf:
                    chunk = conn.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
                line, buf = buf.split(b"\r\n", 1)
                parts = line.decode().split(" ", 1)
                cmd = parts[0].upper()
                arg = parts[1] if len(parts) > 1 else ""

                if cmd == "USER":
                    send("331 password please")
                elif cmd == "PASS":
                    send("230 logged in")
                elif cmd == "TYPE":
                    send("200 type set")
                elif cmd == "PWD":
                    send(f'257 "{cwd}"')
                elif cmd == "CWD":
                    target = arg if arg.startswith("/") else posixpath.join(cwd, arg)
                    target = posixpath.normpath(target)
                    if self._is_dir(target):
                        cwd = target
                        send("250 ok")
                    else:
                        send("550 not a directory")
                elif cmd == "PASV":
                    if data_srv is not None:
                        data_srv.close()
                    data_srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                    data_srv.bind(("127.0.0.1", 0))
                    data_srv.listen(1)
                    p = data_srv.getsockname()[1]
                    send(f"227 entering passive mode (127,0,0,1,{p >> 8},{p & 0xFF})")
                elif cmd == "NLST":
                    target = arg or cwd
                    if not target.startswith("/"):
                        target = posixpath.join(cwd, target)
                    target = posixpath.normpath(target)
                    if not self._is_dir(target):
                        send("550 no such directory")
                        continue
                    send("150 here comes the listing")
                    d = open_data()
                    for name in self._names_in(target):
                        full = posixpath.join(target, name)
                        d.sendall((full + "\r\n").encode())
                    d.close()
                    send("226 done")
                elif cmd == "SIZE":
                    f = self.files.get(posixpath.normpath(arg))
                    if f is None:
                        send("550 no such file")
                    else:
                        send(f"213 {len(f)}")
                elif cmd == "RETR":
                    f = self.files.get(posixpath.normpath(arg))
                    if f is None:
                        send("550 no such file")
                        continue
                    send("150 opening data connection")
                    d = open_data()
                    d.sendall(f)
                    d.close()
                    send("226 transfer complete")
                elif cmd == "QUIT":
                    send("221 bye")
                    return
                else:
                    send(f"502 {cmd} not implemented")
        finally:
            if data_srv is not None:
                data_srv.close()
            conn.close()
