"""HOCON-compatible configuration system.

The reference (cvg/EMAP) drives everything from HOCON files parsed with
pyhocon (`/root/reference/main.py:70-75`, `confs/ABC.conf`).  pyhocon is not
available in this environment, so this module implements the HOCON subset the
shipped configs use -- nested objects, `key = value`, inline/bracket lists,
quoted and bare strings, `#`/`//` comments, numbers in scientific notation --
plus the typed-getter API the reference relies on
(`runner_base.py:43-74`: get_int/get_float/get_bool/get_string with defaults,
`conf["a.b.c"]` path access, and item assignment for the --scan override).
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator


class ConfigError(ValueError):
    pass


_TRUE_STRINGS = {"true", "yes", "on"}
_FALSE_STRINGS = {"false", "no", "off"}

_NUMBER_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _coerce_scalar(token: str) -> Any:
    """Convert a bare HOCON token into bool/int/float, else keep string."""
    low = token.lower()
    if low in _TRUE_STRINGS:
        return True
    if low in _FALSE_STRINGS:
        return False
    if low in ("null", "none"):
        return None
    if _NUMBER_RE.match(token):
        try:
            if re.match(r"^[+-]?\d+$", token):
                return int(token)
            return float(token)
        except ValueError:
            pass
    return token


class _Parser:
    """Recursive-descent parser over the raw text of a HOCON document."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)

    # -- low-level helpers -------------------------------------------------
    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def _skip_ws_and_comments(self, skip_newlines: bool = True) -> None:
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "#" or self.text.startswith("//", self.pos):
                while self.pos < self.n and self.text[self.pos] != "\n":
                    self.pos += 1
            elif c == "\n":
                if not skip_newlines:
                    return
                self.pos += 1
            elif c.isspace():
                self.pos += 1
            else:
                return

    def _read_quoted_string(self) -> str:
        quote = self.text[self.pos]
        self.pos += 1
        out = []
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "\\" and self.pos + 1 < self.n:
                out.append(self.text[self.pos + 1])
                self.pos += 2
            elif c == quote:
                self.pos += 1
                return "".join(out)
            else:
                out.append(c)
                self.pos += 1
        raise ConfigError("unterminated string literal")

    # -- grammar -----------------------------------------------------------
    def parse_document(self) -> dict:
        self._skip_ws_and_comments()
        if self._peek() == "{":
            obj = self.parse_object()
        else:
            obj = self.parse_object_body(top_level=True)
        self._skip_ws_and_comments()
        if self.pos < self.n:
            raise ConfigError(
                f"trailing content at offset {self.pos}: {self.text[self.pos:self.pos+30]!r}"
            )
        return obj

    def parse_object(self) -> dict:
        assert self._peek() == "{"
        self.pos += 1
        obj = self.parse_object_body(top_level=False)
        if self._peek() != "}":
            raise ConfigError(f"expected '}}' at offset {self.pos}")
        self.pos += 1
        return obj

    def parse_object_body(self, top_level: bool) -> dict:
        obj: dict = {}
        while True:
            self._skip_ws_and_comments()
            if self.pos >= self.n:
                if top_level:
                    return obj
                raise ConfigError("unexpected end of input inside object")
            c = self._peek()
            if c == "}":
                return obj
            if c == ",":
                self.pos += 1
                continue
            key = self.parse_key()
            self._skip_ws_and_comments(skip_newlines=False)
            c = self._peek()
            if c == "{":
                value = self.parse_object()
            elif c in ("=", ":"):
                self.pos += 1
                self._skip_ws_and_comments(skip_newlines=False)
                value = self.parse_value()
            else:
                raise ConfigError(
                    f"expected '=', ':' or '{{' after key {key!r} at offset {self.pos}"
                )
            # dotted keys create nested objects (HOCON path expressions)
            parts = key.split(".")
            target = obj
            for part in parts[:-1]:
                target = target.setdefault(part, {})
            leaf = parts[-1]
            if (
                isinstance(value, dict)
                and isinstance(target.get(leaf), dict)
            ):
                target[leaf].update(value)  # HOCON object merge semantics
            else:
                target[leaf] = value

    def parse_key(self) -> str:
        if self._peek() in ('"', "'"):
            return self._read_quoted_string()
        start = self.pos
        while self.pos < self.n and (
            self.text[self.pos].isalnum() or self.text[self.pos] in "._-"
        ):
            self.pos += 1
        if self.pos == start:
            raise ConfigError(f"expected key at offset {self.pos}")
        return self.text[start : self.pos]

    def parse_value(self) -> Any:
        c = self._peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_list()
        if c in ('"', "'"):
            s = self._read_quoted_string()
            # string value concatenation is not needed by the shipped confs
            return s
        return self.parse_bare_scalar()

    def parse_list(self) -> list:
        assert self._peek() == "["
        self.pos += 1
        items: list = []
        while True:
            self._skip_ws_and_comments()
            if self.pos >= self.n:
                raise ConfigError("unterminated list")
            c = self._peek()
            if c == "]":
                self.pos += 1
                return items
            if c == ",":
                self.pos += 1
                continue
            if c == "{":
                items.append(self.parse_object())
            elif c == "[":
                items.append(self.parse_list())
            elif c in ('"', "'"):
                items.append(self._read_quoted_string())
            else:
                start = self.pos
                while self.pos < self.n and self.text[self.pos] not in ",]\n#":
                    if self.text.startswith("//", self.pos):
                        break
                    self.pos += 1
                token = self.text[start : self.pos].strip()
                if token:
                    items.append(_coerce_scalar(token))

    def parse_bare_scalar(self) -> Any:
        # a bare value runs to end-of-line or an inline comment
        start = self.pos
        while self.pos < self.n and self.text[self.pos] not in "\n,}":
            if self.text[self.pos] == "#" or self.text.startswith("//", self.pos):
                break
            self.pos += 1
        token = self.text[start : self.pos].strip()
        if not token:
            raise ConfigError(f"expected value at offset {start}")
        return _coerce_scalar(token)


_MISSING = object()


class Config:
    """Mapping with HOCON path access and pyhocon-style typed getters."""

    def __init__(self, data: dict | None = None):
        self._data: dict = {}
        for k, v in (data or {}).items():
            self._data[k] = Config(v) if isinstance(v, dict) else v

    # -- path resolution ---------------------------------------------------
    def _resolve(self, key: str, default: Any = _MISSING) -> Any:
        node: Any = self
        for part in key.split("."):
            if isinstance(node, Config) and part in node._data:
                node = node._data[part]
            else:
                if default is _MISSING:
                    raise KeyError(key)
                return default
        return node

    def __getitem__(self, key: str) -> Any:
        return self._resolve(key)

    def __setitem__(self, key: str, value: Any) -> None:
        parts = key.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node._data.get(part)
            if not isinstance(nxt, Config):
                nxt = Config()
                node._data[part] = nxt
            node = nxt
        node._data[parts[-1]] = Config(value) if isinstance(value, dict) else value

    def __contains__(self, key: str) -> bool:
        sentinel = object()
        return self._resolve(key, sentinel) is not sentinel

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    # -- typed getters (pyhocon API used by the reference) ------------------
    def get(self, key: str, default: Any = None) -> Any:
        return self._resolve(key, default)

    def get_string(self, key: str, default: Any = _MISSING) -> str:
        v = self._resolve(key, default)
        if v is default and default is not _MISSING:
            return v
        return str(v)

    def get_int(self, key: str, default: Any = _MISSING) -> int:
        v = self._resolve(key, default)
        if v is default and default is not _MISSING:
            return v
        return int(v)

    def get_float(self, key: str, default: Any = _MISSING) -> float:
        v = self._resolve(key, default)
        if v is default and default is not _MISSING:
            return v
        return float(v)

    def get_bool(self, key: str, default: Any = _MISSING) -> bool:
        v = self._resolve(key, default)
        if v is default and default is not _MISSING:
            return v
        if isinstance(v, bool):
            return v
        if isinstance(v, str):
            low = v.lower()
            if low in _TRUE_STRINGS:
                return True
            if low in _FALSE_STRINGS:
                return False
        if isinstance(v, (int, float)):
            return bool(v)
        raise ConfigError(f"cannot interpret {v!r} as bool for key {key!r}")

    def get_list(self, key: str, default: Any = _MISSING) -> list:
        v = self._resolve(key, default)
        if v is default and default is not _MISSING:
            return v
        if not isinstance(v, list):
            raise ConfigError(f"key {key!r} is not a list: {v!r}")
        return v

    def get_config(self, key: str, default: Any = _MISSING) -> "Config":
        v = self._resolve(key, default)
        if isinstance(v, Config):
            return v
        if default is not _MISSING:
            return v
        raise ConfigError(f"key {key!r} is not a config section")

    # -- conversion ----------------------------------------------------------
    def as_dict(self) -> dict:
        out = {}
        for k, v in self._data.items():
            out[k] = v.as_dict() if isinstance(v, Config) else v
        return out

    def to_hocon(self, indent: int = 0) -> str:
        """Serialize back to HOCON (used for the per-run config snapshot,
        mirroring runner_base.file_backup, reference runner_base.py:197-201)."""
        pad = "  " * indent
        lines = []
        for k, v in self._data.items():
            if isinstance(v, Config):
                lines.append(f"{pad}{k} {{")
                lines.append(v.to_hocon(indent + 1))
                lines.append(f"{pad}}}")
            else:
                lines.append(f"{pad}{k} = {json.dumps(v)}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Config({self.as_dict()!r})"


def parse_string(text: str) -> Config:
    return Config(_Parser(text).parse_document())


def parse_file(path: str) -> Config:
    with open(path, "r", encoding="utf-8") as f:
        return parse_string(f.read())
