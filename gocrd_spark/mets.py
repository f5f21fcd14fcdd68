"""METS manifest queries — pure-Python document model.

Re-creates the observable behavior of the reference's ``mets`` package
(/root/reference/mets/mets.go) on top of the namespace-blind walker in
:mod:`gocrd_spark.xmlwalk`. This module is Spark-free; the Spark surface
wraps it inside Arrow batch UDFs (see gocrd_spark.kernel).

Reference parity map (file:line = reference):
- ``Mets.open``            <- mets.Open            (mets/mets.go:29-43)
- ``Mets.find_file_grp``   <- Mets.FindFileGrp     (mets/mets.go:47-49)
- ``Mets.find``            <- Mets.Find + Match.xpath (mets/mets.go:53-59,71-83)
- ``File`` / ``FLocat``    <- mets.File / mets.FLocat (mets/mets.go:86-94)
- projection semantics     <- newFileFromNode / newFLocatFromNode
                              (mets/mets.go:96-126): missing attribute ->
                              empty string; no FLocat child -> zero FLocat.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import xmlwalk as xw


@dataclass(frozen=True)
class FLocat:
    """A mets:FLocat: LOCTYPE + (xlink:)href (mets/mets.go:86-88)."""

    type: str = ""
    url: str = ""


@dataclass(frozen=True)
class File:
    """Output row of a METS query (mets/mets.go:91-94)."""

    mimetype: str = ""
    id: str = ""
    flocat: FLocat = field(default_factory=FLocat)


@dataclass(frozen=True)
class Match:
    """File predicate; empty string = wildcard (mets/mets.go:61-65)."""

    use: str = ""
    file_id: str = ""
    mimetype: str = ""

    def __str__(self) -> str:  # mets/mets.go:67-69
        return f'{{"{self.use}","{self.file_id}","{self.mimetype}"}}'


def _file_from_node(node) -> File:
    """Projection: <file> node -> File (mets/mets.go:96-126)."""
    flocat = FLocat()
    fl = xw.first_child(node, "FLocat")
    if fl is not None:
        flocat = FLocat(
            type=xw.attr(fl, "LOCTYPE") or "",
            url=xw.attr(fl, "href") or "",  # local-name match: xlink:href
        )
    return File(
        mimetype=xw.attr(node, "MIMETYPE") or "",
        id=xw.attr(node, "ID") or "",
        flocat=flocat,
    )


class Mets:
    """An opened METS document."""

    def __init__(self, root, path: str = "<bytes>") -> None:
        self.path = path
        self.root = root

    @classmethod
    def from_bytes(cls, data: bytes, path: str = "<bytes>") -> "Mets":
        return cls(xw.parse_bytes(data), path)

    @classmethod
    def open(cls, path: str) -> "Mets":
        with open(path, "rb") as fh:
            return cls.from_bytes(fh.read(), path)

    def find_file_grp(self, use: str) -> list[File]:
        """All files in the file group with the given USE flag
        (mets/mets.go:47-49)."""
        return self.find(Match(use=use))

    def find(self, match: Match = Match()) -> list[File]:
        """All <file> entries matching the predicate; empty fields are
        wildcards (mets/mets.go:53-83).

        Path shape: /mets/fileSec/fileGrp[@USE=..]/file[@ID=..][@MIMETYPE=..]
        evaluated with local-name matching (matches mets:-prefixed
        elements, SURVEY.md §1.3).
        """
        if xw.local_name(self.root.tag) != "mets":
            return []
        out = []
        for grp in xw.walk(self.root, [("fileSec", None, None), ("fileGrp", None, None)]):
            if match.use and xw.attr(grp, "USE") != match.use:
                continue
            for node in xw.children(grp, "file"):
                if match.file_id and xw.attr(node, "ID") != match.file_id:
                    continue
                if match.mimetype and xw.attr(node, "MIMETYPE") != match.mimetype:
                    continue
                out.append(_file_from_node(node))
        return out
