"""A tiny scanning cursor over a single BEL statement string."""

from __future__ import annotations


class ParseFailure(Exception):
    """Internal parse failure → becomes a BELSyntaxError warning upstream.

    Carries the furthest position reached, for error reporting parity with
    pyparsing's ``ParseException.loc``.
    """

    def __init__(self, pos: int, expected: str = ""):
        super().__init__(pos, expected)
        self.pos = pos
        self.expected = expected


_WORD_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)
_IDENT_CHARS = _WORD_CHARS | {"_"}


class Cursor:
    """Position-tracked scanner with backtracking support."""

    __slots__ = ("text", "pos", "n")

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)

    # -- basic ------------------------------------------------------------

    def save(self) -> int:
        return self.pos

    def restore(self, pos: int) -> None:
        self.pos = pos

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= self.n

    def fail(self, expected: str = "") -> "ParseFailure":
        return ParseFailure(self.pos, expected)

    def skip_ws(self) -> None:
        text, pos, n = self.text, self.pos, self.n
        while pos < n and text[pos] in " \t":
            pos += 1
        self.pos = pos

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < self.n else ""

    # -- literals ---------------------------------------------------------

    def try_literal(self, lit: str) -> bool:
        """Consume ``lit`` if present (after whitespace)."""
        self.skip_ws()
        if self.text.startswith(lit, self.pos):
            self.pos += len(lit)
            return True
        return False

    def expect(self, lit: str) -> None:
        if not self.try_literal(lit):
            raise self.fail(lit)

    # -- tokens -----------------------------------------------------------

    def try_word(self) -> str:
        """Read a maximal run of [A-Za-z0-9]; '' if none."""
        self.skip_ws()
        text, pos, n = self.text, self.pos, self.n
        start = pos
        while pos < n and text[pos] in _WORD_CHARS:
            pos += 1
        self.pos = pos
        return text[start:pos]

    def try_identifier(self) -> str:
        """Read a maximal run of [A-Za-z0-9_]; '' if none."""
        self.skip_ws()
        text, pos, n = self.text, self.pos, self.n
        start = pos
        while pos < n and text[pos] in _IDENT_CHARS:
            pos += 1
        self.pos = pos
        return text[start:pos]

    def try_chars(self, charset) -> str:
        """Read a maximal run of the given characters; '' if none."""
        self.skip_ws()
        text, pos, n = self.text, self.pos, self.n
        start = pos
        while pos < n and text[pos] in charset:
            pos += 1
        self.pos = pos
        return text[start:pos]

    def try_quote(self):
        """Read a double-quoted string with backslash escapes; None if absent."""
        self.skip_ws()
        text, pos, n = self.text, self.pos, self.n
        if pos >= n or text[pos] != '"':
            return None
        pos += 1
        out = []
        while pos < n:
            c = text[pos]
            if c == "\\" and pos + 1 < n and text[pos + 1] in ('"', "\\"):
                out.append(text[pos + 1])
                pos += 2
                continue
            if c == '"':
                self.pos = pos + 1
                return "".join(out)
            out.append(c)
            pos += 1
        raise self.fail('closing "')

    def try_word_or_quote(self):
        q = self.try_quote()
        if q is not None:
            return q
        w = self.try_word()
        return w if w else None

    def try_int(self):
        """Read an (optionally signed) integer; None if absent."""
        self.skip_ws()
        text, pos, n = self.text, self.pos, self.n
        start = pos
        if pos < n and text[pos] in "+-":
            pos += 1
        digits_start = pos
        while pos < n and text[pos].isdigit():
            pos += 1
        if pos == digits_start:
            return None
        self.pos = pos
        return int(text[start:pos])
