"""Source-code tokenizer (camelCase/PascalCase/hex splitting).

Behavioral re-implementation of the reference's `CodeTokenizer`
(`quickwit-query/src/tokenizers/code_tokenizer.rs`): split on
delimiters (non-alphanumeric), then on character-class boundaries
(upper/lower/numeric), gluing a single leading uppercase onto a
following lowercase run (`PigCaféFactory2` → Pig·Café·Factory·2,
`RPCResult` → RPC·Result). With hex support, even-length runs of
case-consistent hex digits are kept whole (`fa63bbbf-0fb9` →
fa63bbbf·0fb9) and fall back to the plain rules otherwise — including
the reference's backtracking when a mixed-class hex candidate fails
(`561dc0f444a` → 561·dc·0·f·444·a). Expectations mirror the reference's
test vectors (`code_tokenizer.rs:425-800`).
"""

from __future__ import annotations

_UPPER, _LOWER, _NUM, _DELIM = 0, 1, 2, 3


def _char_type(c: str) -> int:
    if c.isalpha():
        return _UPPER if c.isupper() else _LOWER
    if c.isnumeric():
        return _NUM
    return _DELIM


def _is_ascii_hex(c: str) -> bool:
    return ("0" <= c <= "9") or ("a" <= c <= "f") or ("A" <= c <= "F")


class _Chars:
    """ProcessingChars state: a run being split on class boundaries."""

    __slots__ = ("is_first", "start", "cur_off", "cur_type")

    def __init__(self, is_first, start, cur_off, cur_type):
        self.is_first = is_first
        self.start = start
        self.cur_off = cur_off
        self.cur_type = cur_type


class _Hex:
    """ProcessingHex state: a candidate hex run (case-consistent)."""

    __slots__ = ("seen_u", "seen_l", "seen_n", "start", "cur_off")

    def __init__(self, seen_u, seen_l, seen_n, start, cur_off):
        self.seen_u = seen_u
        self.seen_l = seen_l
        self.seen_n = seen_n
        self.start = start
        self.cur_off = cur_off

    def chars_state(self) -> "_Chars | None":
        flags = (self.seen_u, self.seen_l, self.seen_n)
        if sum(flags) != 1:
            return None  # irrecoverable: mixed classes → backtrack
        cur_type = (_UPPER, _LOWER, _NUM)[flags.index(True)]
        return _Chars(self.cur_off == self.start, self.start, self.cur_off, cur_type)


def code_token_spans(text: str, enable_hex: bool = False) -> list[tuple[int, int]]:
    """(start, end) character spans of the code tokens of `text`."""
    n = len(text)
    spans: list[tuple[int, int]] = []
    pos = 0
    state: _Chars | _Hex | None = None

    def step(off: int, c: str, allow_hex: bool):
        """Consume one char. Returns None | ("emit", span) | "backtrack".
        May leave the char logically re-consumed via the recursion below."""
        nonlocal state
        ctype = _char_type(c)
        if state is None:
            if ctype == _DELIM:
                return None
            if allow_hex and _is_ascii_hex(c):
                state = _Hex(ctype == _UPPER, ctype == _LOWER, ctype == _NUM, off, off)
            else:
                state = _Chars(True, off, off, ctype)
            return None
        if isinstance(state, _Chars):
            st = state
            if ctype == _DELIM:
                span = (st.start, st.cur_off + 1)
                state = None
                return ("emit", span)
            if st.cur_type == _UPPER and ctype == _LOWER:
                if st.is_first:
                    st.is_first = False
                    st.cur_off = off
                    st.cur_type = ctype
                    return None
                span = (st.start, st.cur_off)
                st.is_first = False
                st.start = st.cur_off
                st.cur_off = off
                st.cur_type = ctype
                return ("emit", span)
            if st.cur_type == ctype:
                st.is_first = False
                st.cur_off = off
                return None
            span = (st.start, st.cur_off + 1)
            st.is_first = True
            st.start = off
            st.cur_off = off
            st.cur_type = ctype
            return ("emit", span)
        # hex state
        st = state
        ok = False
        if "0" <= c <= "9":
            st.seen_n = True
            ok = True
        elif "a" <= c <= "f":
            if not st.seen_u:
                st.seen_l = True
                ok = True
        elif "A" <= c <= "F":
            if not st.seen_l:
                st.seen_u = True
                ok = True
        elif ctype == _DELIM and (off - st.start) % 2 == 0:
            span = (st.start, off)
            state = None
            return ("emit", span)
        if ok:
            st.cur_off = off
            return None
        # demote to plain chars state and re-consume this char
        cs = st.chars_state()
        if cs is None:
            return "backtrack"
        state = cs
        return step(off, c, allow_hex)

    def finalize():
        nonlocal state
        if state is None:
            return None
        if isinstance(state, _Chars):
            span = (state.start, state.cur_off + 1)
            state = None
            return ("emit", span)
        st = state
        if (st.cur_off + 1 - st.start) % 2 == 0:
            span = (st.start, st.cur_off + 1)
            state = None
            return ("emit", span)
        cs = st.chars_state()
        if cs is None:
            return "backtrack"
        state = cs
        return finalize()

    def advance(allow_hex: bool):
        nonlocal pos, state
        checkpoint = pos
        while pos < n:
            off = pos
            c = text[pos]
            pos += 1
            res = step(off, c, allow_hex)
            if res is None:
                continue
            if res == "backtrack":
                pos = checkpoint
                state = None
                return advance(False)
            return res[1]
        res = finalize()
        if res is None:
            return None
        if res == "backtrack":
            pos = checkpoint
            state = None
            return advance(False)
        return res[1]

    while True:
        span = advance(enable_hex)
        if span is None:
            return spans
        spans.append(span)


def code_tokens(text: str, enable_hex: bool = False) -> list[str]:
    return [text[s:e] for s, e in code_token_spans(text, enable_hex)]
