"""Hook surface (SURVEY §2.K).

Reference: /root/reference/internal/hooks/hooks.go — shell hooks around
file open/close with an env-var contract (WARC_COMMAND, WARC_FILE_NAME,
WARC_ERROR_COUNT, WARC_HASH, ...; hooks.go:14-24), exit code 1 = error,
exit code 10 = "skip this file" (hooks.go:58-75).

Spark-first: hooks are *driver-side* callbacks around round/file-batch
execution (never distributed UDFs — a shell per task would be the slow
path and a security hole). Skip semantics become an exclusion DataFrame
fed to the walker's anti-join.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

SKIP = 10  # hooks.go:58-75
ERROR = 1
OK = 0

HookFn = Callable[[dict], int]  # context dict -> exit code


@dataclass
class Hooks:
    open_input: list[HookFn] = field(default_factory=list)
    close_input: list[HookFn] = field(default_factory=list)
    open_output: list[HookFn] = field(default_factory=list)
    close_output: list[HookFn] = field(default_factory=list)

    def run(self, kind: str, ctx: dict) -> int:
        """Run hooks of ``kind``; first non-zero code wins (ERROR aborts,
        SKIP excludes the file). ctx mirrors the env-var contract keys:
        command, file_name, error_count, hash, size, hook_type."""
        ctx = dict(ctx, hook_type=kind)
        for fn in getattr(self, kind):
            code = fn(ctx)
            if code != OK:
                return code
        return OK

    def filter_files(self, files: list[str], command: str) -> tuple[list[str], list[str]]:
        """Apply open_input hooks; returns (kept, skipped). An ERROR code
        raises (the reference aborts the file with an error result)."""
        kept, skipped = [], []
        for f in files:
            code = self.run("open_input", {"command": command, "file_name": f})
            if code == SKIP:
                skipped.append(f)
            elif code == ERROR:
                raise RuntimeError(f"open_input hook failed for {f}")
            else:
                kept.append(f)
        return kept, skipped
