"""A recording stub of the ~25 streamlit calls the UI layer uses.

streamlit isn't installable in this environment (no egress), so the pages are
import-gated; this stub lets pytest drive them end-to-end: every `st.*` call
is recorded, widgets return their defaults (or values forced through
``overrides``), and layout primitives (columns/expander/tabs/sidebar) return
context-manager proxies so `with` blocks execute their bodies.

Install with ``sys.modules["streamlit"] = FakeStreamlit()`` — the import
system hands back whatever object sys.modules holds, so the pages' deferred
``import streamlit as st`` resolves to the stub.
"""

from __future__ import annotations


class SessionState(dict):
    """Dict with attribute access, like streamlit's session_state."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        self[key] = value


class FakeStreamlit:
    def __init__(self):
        self.calls = []            # (name, args, kwargs) in render order
        self.session_state = SessionState()
        self.overrides = {}        # widget key or label -> forced return value
        self.sidebar = self

    # layout primitives return self so `with` bodies run
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    # -- helpers -----------------------------------------------------------

    def widget_labels(self, name=None):
        return [
            c[1][0] for c in self.calls
            if c[1] and isinstance(c[1][0], str) and (name is None or c[0] == name)
        ]

    def _lookup_override(self, args, kwargs):
        for probe in (kwargs.get("key"), args[0] if args else None):
            try:
                if probe is not None and probe in self.overrides:
                    return True, self.overrides[probe]
            except TypeError:  # unhashable label (e.g. columns spec list)
                pass
        return False, None

    def _default_return(self, name, args, kwargs):
        hit, forced = self._lookup_override(args, kwargs)
        if hit:
            return forced
        if name in ("button", "download_button", "form_submit_button"):
            return False
        if name in ("checkbox", "toggle"):
            return kwargs.get("value", args[1] if len(args) > 1 else False)
        if name in ("text_input", "text_area"):
            v = kwargs.get("value", args[1] if len(args) > 1 else "")
            return v if isinstance(v, str) else ""
        if name in ("number_input", "slider"):
            if "value" in kwargs:
                return kwargs["value"]
            return args[3] if len(args) > 3 else (args[1] if len(args) > 1 else 0)
        if name in ("selectbox", "radio"):
            options = kwargs.get("options", args[1] if len(args) > 1 else None)
            options = list(options) if options is not None else []
            idx = kwargs.get("index", 0)
            return options[idx] if options and idx is not None else None
        if name == "multiselect":
            return kwargs.get("default", [])
        if name == "columns":
            spec = args[0] if args else 1
            n = spec if isinstance(spec, int) else len(spec)
            return [self] * n
        if name == "tabs":
            return [self] * len(args[0])
        if name in ("expander", "spinner", "container", "form", "empty",
                    "progress", "status"):
            return self
        if name == "file_uploader":
            return None
        if name == "cache_data":
            if args and callable(args[0]) and not kwargs:
                return args[0]
            return lambda fn: fn
        return None

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def call(*args, **kwargs):
            self.calls.append((name, args, kwargs))
            return self._default_return(name, args, kwargs)

        return call
