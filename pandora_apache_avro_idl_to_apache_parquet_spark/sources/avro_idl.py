"""Avro IDL (``.avdl``) front door → canonical ``.avsc`` dicts.

The reference corpus ships protocol files (``/root/reference/avro/avdl/**``)
whose compiled ``.avsc`` twins feed the schema walk (``Avro.fs:27-145``); real
Avro shops author the IDL. This module parses the IDL subset that corpus uses
— protocol header annotations, ``record``/``error``/``enum``/``fixed``
declarations, logical-type shorthands (``date``, ``time_ms``,
``timestamp_ms``, ``decimal(p,s)``, ``uuid``), ``array<>``/``map<>``/
``union{}`` compositions, field defaults, doc comments, type- and field-level
``@annotations``, enum defaults, and ``import idl`` — and emits, per named
type, a self-contained Avro-JSON schema with first-use inline expansion and
by-name back references, exactly the shape of the reference's ``.avsc`` files,
ready for :func:`.avro_schema.avsc_to_struct`.

RPC ``message`` declarations are not parsed (none exist in the corpus; the
engine consumes data schemas, not RPC signatures) — one is a parse error.
"""

from __future__ import annotations

import copy
import os
import re
from dataclasses import dataclass, field

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}
# IDL logical-type shorthands → their Avro-JSON spelling
_LOGICAL = {
    "date": {"type": "int", "logicalType": "date"},
    "time_ms": {"type": "int", "logicalType": "time-millis"},
    "timestamp_ms": {"type": "long", "logicalType": "timestamp-millis"},
    "local_timestamp_ms": {
        "type": "long", "logicalType": "local-timestamp-millis"
    },
    "uuid": {"type": "string", "logicalType": "uuid"},
}
# annotations that attach to the FIELD (everything else decorates the type)
_FIELD_ANNOTS = {"order", "aliases"}

_TOKEN_RE = re.compile(
    r"""
    (?P<doc>/\*\*.*?\*/)
  | (?P<comment>/\*.*?\*/|//[^\n]*)
  | (?P<annot>@[A-Za-z_][\w.-]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)
  | (?P<punct>[{}()<>\[\],;=:`])
  | (?P<ws>\s+)
    """,
    re.VERBOSE | re.DOTALL,
)


def _strip_doc(raw: str) -> str:
    body = raw[3:-2]  # drop /** and */
    lines = [re.sub(r"^\s*\*?\s?", "", ln).rstrip() for ln in body.splitlines()]
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(ln.strip() for ln in lines)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"avdl: cannot tokenize at offset {pos}: "
                             f"{text[pos:pos + 40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "doc":
            out.append(("doc", _strip_doc(m.group())))
        elif kind == "annot":
            out.append(("annot", m.group()[1:]))
        else:
            out.append((kind, m.group()))
    return out


@dataclass
class AvdlProtocol:
    """Parsed protocol: named types in declaration order (imports first),
    each a canonical Avro-JSON dict whose named references are fullnames."""

    name: str
    namespace: str | None
    types: list[str] = field(default_factory=list)   # fullnames, decl order
    defs: dict[str, dict] = field(default_factory=dict)
    props: dict = field(default_factory=dict)


class _IdlParser:
    def __init__(self, tokens: list[tuple[str, str]], base_dir: str | None,
                 seen_imports: set[str]):
        self.toks = tokens
        self.i = 0
        self.base_dir = base_dir
        self.seen_imports = seen_imports

    # -- token plumbing ----------------------------------------------------

    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind: str, val: str | None = None) -> str:
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"avdl: expected {val or kind}, got {v!r}")
        return v

    def _eat(self, kind: str, val: str) -> bool:
        k, v = self._peek()
        if k == kind and v == val:
            self.i += 1
            return True
        return False

    # -- values (defaults, annotation payloads) -----------------------------

    def _value(self):
        k, v = self._next()
        if k == "string":
            return _unquote(v)
        if k == "number":
            return float(v) if ("." in v or "e" in v or "E" in v) else int(v)
        if k == "name":
            if v == "null":
                return None
            if v == "true":
                return True
            if v == "false":
                return False
            return v  # bare enum symbol default
        if (k, v) == ("punct", "["):
            out = []
            if not self._eat("punct", "]"):
                while True:
                    out.append(self._value())
                    if self._eat("punct", "]"):
                        break
                    self._expect("punct", ",")
            return out
        if (k, v) == ("punct", "{"):
            obj = {}
            if not self._eat("punct", "}"):
                while True:
                    key_k, key_v = self._next()
                    key = _unquote(key_v) if key_k == "string" else key_v
                    self._expect("punct", ":")
                    obj[key] = self._value()
                    if self._eat("punct", "}"):
                        break
                    self._expect("punct", ",")
            return obj
        raise ValueError(f"avdl: unexpected value token {v!r}")

    def _annotations(self) -> dict:
        props = {}
        while self._peek()[0] == "annot":
            _, name = self._next()
            self._expect("punct", "(")
            props[name] = self._value()
            self._expect("punct", ")")
        return props

    def _doc(self) -> str | None:
        if self._peek()[0] == "doc":
            return self._next()[1]
        return None

    # -- types ---------------------------------------------------------------

    def _type(self, ns: str | None):
        """Returns the Avro-JSON type (str or dict). Named refs come back as
        FULLNAMES (resolved against the protocol namespace)."""
        props = self._annotations()
        k, v = self._next()
        if (k, v) == ("name", "union"):
            self._expect("punct", "{")
            branches = []
            while True:
                branches.append(self._type(ns))
                if self._eat("punct", "}"):
                    break
                self._expect("punct", ",")
            return branches  # unions cannot carry properties: props dropped
        if (k, v) == ("name", "array"):
            self._expect("punct", "<")
            items = self._type(ns)
            self._expect("punct", ">")
            return {"type": "array", "items": items, **props}
        if (k, v) == ("name", "map"):
            self._expect("punct", "<")
            values = self._type(ns)
            self._expect("punct", ">")
            return {"type": "map", "values": values, **props}
        if (k, v) == ("name", "decimal"):
            self._expect("punct", "(")
            p = int(self._expect("number"))
            self._expect("punct", ",")
            s = int(self._expect("number"))
            self._expect("punct", ")")
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": p, "scale": s, **props}
        if k == "name" and v in _LOGICAL:
            return {**_LOGICAL[v], **props}
        if k == "name" and v in _PRIMITIVES:
            return {"type": v, **props} if props else v
        if k == "name":
            ref = v if "." in v else (f"{ns}.{v}" if ns else v)
            return {"type": ref, **props} if props else ref
        raise ValueError(f"avdl: unexpected type token {v!r}")

    # -- declarations ----------------------------------------------------------

    def _named_type(self, doc, props, ns, proto: AvdlProtocol):
        k, v = self._next()
        if v in ("record", "error"):
            name = self._expect("name")
            self._expect("punct", "{")
            fields = []
            while not self._eat("punct", "}"):
                fields.append(self._field(ns))
            d = {"type": v, "name": name, "namespace": ns}
            if doc:
                d["doc"] = doc
            d["fields"] = fields
            d.update(props)
        elif v == "enum":
            name = self._expect("name")
            self._expect("punct", "{")
            symbols = []
            while True:
                symbols.append(self._expect("name"))
                if self._eat("punct", "}"):
                    break
                self._expect("punct", ",")
            d = {"type": "enum", "name": name, "namespace": ns}
            if doc:
                d["doc"] = doc
            d["symbols"] = symbols
            if self._eat("punct", "="):
                d["default"] = self._expect("name")
            self._eat("punct", ";")
            d.update(props)
        elif v == "fixed":
            name = self._expect("name")
            self._expect("punct", "(")
            size = int(self._expect("number"))
            self._expect("punct", ")")
            self._eat("punct", ";")
            d = {"type": "fixed", "name": name, "namespace": ns}
            if doc:
                d["doc"] = doc
            d["size"] = size
            d.update(props)
        else:
            raise ValueError(f"avdl: unsupported declaration {v!r} "
                             "(messages are not part of the data front door)")
        fq = f"{ns}.{name}" if ns else name
        if fq in proto.defs:
            raise ValueError(f"avdl: duplicate type declaration {fq!r}")
        proto.defs[fq] = d
        proto.types.append(fq)

    def _field(self, ns: str | None) -> dict:
        doc = self._doc()
        ftype = self._type(ns)  # pre-type annotations land on the type
        # annotations between type and name: order/aliases → field; others →
        # type (only representable on non-union dict types)
        mid = self._annotations()
        fname = self._expect("name")
        f: dict = {"name": fname, "type": ftype}
        if doc:
            f["doc"] = doc
        if self._eat("punct", "="):
            f["default"] = self._value()
        self._expect("punct", ";")
        for key, val in mid.items():
            if key in _FIELD_ANNOTS:
                f[key] = val
            elif isinstance(ftype, dict):
                ftype[key] = val
            elif isinstance(ftype, str):
                f["type"] = {"type": ftype, key: val}
                ftype = f["type"]
            # union: property silently dropped (not representable in avsc)
        return f

    def _import(self, proto: AvdlProtocol):
        kind = self._expect("name")
        path = _unquote(self._expect("string"))
        self._expect("punct", ";")
        if kind != "idl":
            raise ValueError(f"avdl: only 'import idl' is supported, got "
                             f"'import {kind}'")
        full = os.path.normpath(os.path.join(self.base_dir or ".", path))
        if full in self.seen_imports:
            return
        self.seen_imports.add(full)
        with open(full) as fh:
            sub = _parse_text(fh.read(), os.path.dirname(full),
                              self.seen_imports)
        for fq in sub.types:  # imported types first, declaration order
            if fq not in proto.defs:
                proto.defs[fq] = sub.defs[fq]
                proto.types.append(fq)

    def parse_protocol(self) -> AvdlProtocol:
        self._doc()
        props = self._annotations()
        self._expect("name", "protocol")
        name = self._expect("name")
        ns = props.pop("namespace", None)
        proto = AvdlProtocol(name=name, namespace=ns, props=props)
        self._expect("punct", "{")
        while not self._eat("punct", "}"):
            doc = self._doc()
            inner = self._annotations()
            if self._peek() == ("name", "import"):
                self._next()
                self._import(proto)
                continue
            self._named_type(doc, inner, ns, proto)
        return proto


def _unquote(s: str) -> str:
    import json

    return json.loads(s)


def _parse_text(text: str, base_dir: str | None,
                seen: set[str]) -> AvdlProtocol:
    return _IdlParser(_tokenize(text), base_dir, seen).parse_protocol()


def parse_avdl(path: str) -> AvdlProtocol:
    """Parse a ``.avdl`` protocol file (following ``import idl``). The root
    file seeds the seen-set, so a circular ``import idl`` chain that leads
    back to the root is a no-op instead of a duplicate re-parse."""
    full = os.path.normpath(os.path.abspath(path))
    with open(full) as fh:
        return _parse_text(fh.read(), os.path.dirname(full), {full})


def parse_avdl_text(text: str, base_dir: str | None = None) -> AvdlProtocol:
    """Parse ``.avdl`` protocol source text (``import idl`` resolves against
    ``base_dir`` when given)."""
    return _parse_text(text, base_dir, set())


def avdl_schema(proto: AvdlProtocol, name: str) -> dict:
    """Self-contained Avro-JSON schema for one named type: first use of each
    named type expands inline (carrying its namespace), later uses and
    recursive back references stay by-fullname — the compiled ``.avsc``
    twin's shape, so truncation/provenance from
    :func:`.avro_schema.avsc_to_struct` matches the twin's exactly."""
    fq = name if name in proto.defs else (
        f"{proto.namespace}.{name}" if proto.namespace else name
    )
    if fq not in proto.defs:
        raise KeyError(f"type {name!r} not declared in protocol {proto.name}")
    emitted: set[str] = set()

    def expand(t):
        if isinstance(t, str):
            if t in proto.defs and t not in emitted:
                return expand_def(t)
            return t
        if isinstance(t, list):
            return [expand(b) for b in t]
        if isinstance(t, dict):
            out = dict(t)
            if out.get("type") == "array":
                out["items"] = expand(out["items"])
            elif out.get("type") == "map":
                out["values"] = expand(out["values"])
            elif out.get("type") in proto.defs and out["type"] not in emitted:
                # annotated named ref: inline the definition, keep the props
                inner = expand_def(out.pop("type"))
                inner.update(out)
                return inner
            return out
        return t

    def expand_def(fqname: str) -> dict:
        emitted.add(fqname)
        d = copy.deepcopy(proto.defs[fqname])
        if d.get("type") in ("record", "error"):
            for f in d["fields"]:
                f["type"] = expand(f["type"])
        return d

    return expand_def(fq)


def avdl_to_structs(path: str):
    """Every record/error type of a ``.avdl`` protocol as
    :class:`.avro_schema.AvroSchemaInfo` (ready for
    :func:`..operators.nested.flatten_table`)."""
    from .avro_schema import avsc_to_struct

    proto = parse_avdl(path)
    out = {}
    for fq in proto.types:
        if proto.defs[fq]["type"] in ("record", "error"):
            out[fq] = avsc_to_struct(avdl_schema(proto, fq))
    return out
