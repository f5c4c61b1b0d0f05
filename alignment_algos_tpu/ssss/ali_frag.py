"""A fragment: one diagonal placement of the query against a template SSE
(ali_frag.{h,cpp})."""

from __future__ import annotations

from .defs import FragConnection, FragID

ACTIVE = 1
AVAILABLE = 0
REDUNDANT = -1


class AliFrag:
    __slots__ = ("t_sse_beg", "t_sse_end", "t_core_beg", "t_core_end",
                 "qt_shift", "next_frags", "status", "sse_id", "frag_id",
                 "frag_is_N_terminal", "frag_is_C_terminal", "score",
                 "z_score", "num_children")

    def __init__(self, t1_sse: int, t2_sse: int, t1_core: int, t2_core: int,
                 qt: int, score: float, n_term: bool, c_term: bool) -> None:
        self.t_sse_beg = t1_sse
        self.t_sse_end = t2_sse
        self.t_core_beg = t1_core
        self.t_core_end = t2_core
        self.qt_shift = qt
        self.score = float(score)
        self.z_score = 0.0
        self.num_children = 0
        self.frag_is_N_terminal = n_term
        self.frag_is_C_terminal = c_term
        self.next_frags: list[FragConnection] = []
        self.status = AVAILABLE
        self.sse_id = -1
        self.frag_id = -1

    @classmethod
    def full(cls, t1: int, t2: int, qt: int, score: float, n_term: bool,
             c_term: bool) -> "AliFrag":
        return cls(t1, t2, t1, t2, qt, score, n_term, c_term)

    # geometry accessors (ali_frag.h:47-62)
    def core_t0(self): return self.t_core_beg
    def core_t1(self): return self.t_core_end
    def core_q0(self): return self.t_core_beg + self.qt_shift
    def core_q1(self): return self.t_core_end + self.qt_shift
    def sse_t0(self): return self.t_sse_beg
    def sse_t1(self): return self.t_sse_end
    def sse_q0(self): return self.t_sse_beg + self.qt_shift
    def sse_q1(self): return self.t_sse_end + self.qt_shift
    def q(self, t): return t + self.qt_shift
    def qt(self): return self.qt_shift
    def core_len(self): return self.t_core_end - self.t_core_beg + 1
    def sse_len(self): return self.t_sse_end - self.t_sse_beg + 1
    def ss(self): return self.score
    def zs(self): return self.z_score

    def is_active(self): return self.status == ACTIVE
    def is_available(self): return self.status == AVAILABLE
    def is_redundant(self): return self.status == REDUNDANT
    def make_active(self): self.status = ACTIVE
    def make_available(self): self.status = AVAILABLE
    def make_redundant(self): self.status = REDUNDANT

    def get_id(self) -> FragID:
        return FragID(self.sse_id, self.frag_id)

    def make_connection(self, f_next: FragID, prev_end: int, next_beg: int,
                        score: float) -> None:
        self.next_frags.append(FragConnection(
            self.get_id(), f_next, prev_end, next_beg, float(score)))

    def num_next(self): return len(self.next_frags)
    def get_next(self, i): return self.next_frags[i]
    def get_last_next(self): return self.next_frags[-1]
    def clear_next(self): self.next_frags = []
