"""CAS unit tests: constructors, simplifier, unrolling, derivatives,
weak-form collection — against known tensor-calculus identities."""

import pytest

from metafem.symbolics import (
    Bilinear, SymRef, TensorTable, VariableRegistry, Word, add, as_term,
    bilinear_term, build_weakform, collect_variations, construct_term,
    diff_space, diff_time, diff_variation, free_index, dumb_index, mul,
    simplify_common, substitute, unroll_dumb_indices, unroll_and_simplify,
    visualize, word_to_sym,
)
from metafem.symbolics.ir import pow_


@pytest.fixture
def env():
    reg = VariableRegistry()
    reg.declare("T", "INTERNAL_VAR")
    reg.declare("u", "INTERNAL_VAR")
    reg.declare("s", "EXTERNAL_VAR", "CONTROLPOINT_VAR")
    reg.declare("g", "EXTERNAL_VAR", "GLOBAL_VAR")
    tb = TensorTable(2, reg)
    return reg, tb


def W(base, td=0, c=(), sd=(), sym=False):
    return Word(base, td, c, sd, symmetric=sym)


# ---------------------------------------------------------------------------
# constructors / folding
# ---------------------------------------------------------------------------

def test_constant_folding():
    assert construct_term("+", [1.0, 2.0]) == 3.0
    assert construct_term("*", [2.0, 3.0]) == 6.0
    assert construct_term("^", [2.0, 3.0]) == 8.0
    assert construct_term("*", [0.0, W("T")]) == 0.0
    assert construct_term("*", [1.0, W("T")]) == W("T")
    assert construct_term("^", [W("T"), 1.0]) == W("T")
    assert construct_term("^", [W("T"), 0.0]) == 1.0


def test_minus_division_desugar():
    t = construct_term("-", [W("T")])
    assert t.op == "*" and -1.0 in t.subterms
    d = construct_term("/", [W("T"), W("s")])
    assert d.op == "*"


def test_index_bookkeeping():
    # T_{;i} * T_{;i}: i summed
    t = mul([W("T", sd=("i",)), W("T", sd=("i",))])
    assert free_index(t) == ()
    assert dumb_index(t) == ("i",)
    # u_i * u_j: both free
    t2 = mul([W("u", c=("i",)), W("u", c=("j",))])
    assert set(free_index(t2)) == {"i", "j"}
    # triple occurrence errors
    with pytest.raises(ValueError):
        mul([W("u", c=("i",)), W("u", c=("i",)), W("u", c=("i",))])


def test_add_requires_matching_free_index():
    with pytest.raises(ValueError):
        add([W("u", c=("i",)), W("u", c=("j",))])
    t = add([W("u", c=("i",)), W("T", sd=("i",))])
    assert free_index(t) == ("i",)


def test_symmetric_component_sort():
    w1 = W("sig", c=(2, 1), sym=True)
    w2 = W("sig", c=(1, 2), sym=True)
    assert w1 == w2


def test_nested_dumb_renaming():
    # (u_i u_i) * (u_i u_i): inner dumb i must not clash at product level
    inner = mul([W("u", c=("i",)), W("u", c=("i",))])
    t = mul([inner, inner])
    assert free_index(t) == ()
    flat = unroll_dumb_indices(t, 2)
    # == (u1^2+u2^2)^2 expanded -> check merge produces 3 terms
    s = simplify_common(flat)
    assert s.op == "+"


# ---------------------------------------------------------------------------
# unrolling and simplification
# ---------------------------------------------------------------------------

def test_unroll_2d():
    t = mul([W("T", sd=("i",)), W("T", sd=("i",))])
    u = unroll_dumb_indices(t, 2)
    assert u.op == "+"
    assert len(u.subterms) == 2
    subs = set(u.subterms)
    assert mul([W("T", sd=(1,)), W("T", sd=(1,))]) in subs


def test_merge_like_terms():
    a = W("T")
    t = simplify_common(add([a, a, a]))
    assert t.op == "*" and 3.0 in t.subterms
    # powers merge: a * a -> a^2
    t2 = simplify_common(mul([a, a]))
    assert t2.op == "^" and t2.subterms[1] == 2.0
    # cancellation
    t3 = simplify_common(add([a, mul([-1.0, a])]))
    assert t3 == 0.0


def test_distribution():
    a, b, c = W("T"), W("s"), W("g")
    t = simplify_common(mul([a, add([b, c])]))
    assert t.op == "+"
    assert len(t.subterms) == 2


def test_kronecker_delta_eval():
    d11 = W("delta", c=(1, 1), sym=True)
    d12 = W("delta", c=(1, 2), sym=True)
    assert unroll_and_simplify(mul([2.0, d11]), 2) == 2.0
    assert unroll_and_simplify(mul([2.0, d12]), 2) == 0.0
    # delta_{i,j} u_i u_j == u_i u_i
    t = mul([W("delta", c=("i", "j"), sym=True),
             W("u", c=("i",)), W("u", c=("j",))])
    direct = mul([W("u", c=("i",)), W("u", c=("i",))])
    assert unroll_and_simplify(t, 2) == unroll_and_simplify(direct, 2)


def test_levi_civita():
    # eps_{ijk} eps_{ijk} = 6 in 3D
    t = mul([W("eps3", c=("i", "j", "k")), W("eps3", c=("i", "j", "k"))])
    assert unroll_and_simplify(t, 3) == 6.0


# ---------------------------------------------------------------------------
# derivatives
# ---------------------------------------------------------------------------

def test_diff_time(env):
    reg, tb = env
    assert diff_time(W("T"), tb) == W("T", td=1)
    assert diff_time(W("s"), tb) == 0.0  # external
    # product rule: d/dt (T*T) = 2 T T_t
    t = diff_time(mul([W("T"), W("T")]), tb)
    expect = simplify_common(mul([2.0, W("T"), W("T", td=1)]))
    assert t == expect


def test_diff_space(env):
    reg, tb = env
    assert diff_space(W("T"), 1, tb) == W("T", sd=(1,))
    # controlpoint external var has spatial derivative
    assert diff_space(W("s"), 1, tb) == W("s", sd=(1,))
    # global var does not
    assert diff_space(W("g"), 1, tb) == 0.0
    # power rule: d/dx T^2 = 2 T T_x
    t = diff_space(pow_(W("T"), 2.0), 1, tb)
    assert t == simplify_common(mul([2.0, W("T"), W("T", sd=(1,))]))


def test_diff_variation_collect(env):
    reg, tb = env
    # δ(T^2) = 2 T δT
    buf = collect_variations(pow_(W("T"), 2.0), tb)
    assert list(buf.keys()) == [W("T")]
    coeff = simplify_common(add(buf[W("T")]))
    assert coeff == simplify_common(mul([2.0, W("T")]))
    # δ(T_x * s): coefficient of δ(T_x) is s
    buf2 = collect_variations(mul([W("T", sd=(1,)), W("s")]), tb)
    assert buf2[W("T", sd=(1,))] == [W("s")]


def test_definition_tensor(env):
    reg, tb = env
    # define q{i} = T_{;i}, then variation of q_i q_i hits T
    tb.define("q", ("i",), W("T", sd=("i",)))
    t = unroll_and_simplify(
        mul([W("q", c=("i",)), W("q", c=("i",))]), 2)
    buf = collect_variations(t, tb)
    assert W("T", sd=(1,)) in buf
    # coefficient keeps the definition var; lowering resolves it later
    coeff = simplify_common(add(buf[W("T", sd=(1,))]))
    assert coeff == simplify_common(mul([2.0, W("q", c=(1,))]))
    assert tb.evaluate_tensor(W("q", c=(1,))) == W("T", sd=(1,))


def test_symbol_derivative_tensor(env):
    reg, tb = env
    # W = F_{ij} F_{ij}; dW/dF_{kl} = 2 F_{kl}
    reg.declare("F", "INTERNAL_VAR")  # treat F as a field for this test
    tb.define("Wd", (), mul([W("F", c=("i", "j")), W("F", c=("i", "j"))]))
    from metafem.symbolics.diff import diff_symbol
    inst = tb.evaluate_tensor(W("Wd"))
    got = diff_symbol(inst, tb, W("F", c=(1, 2)))
    assert got == simplify_common(mul([2.0, W("F", c=(1, 2))]))


# ---------------------------------------------------------------------------
# weak-form collection
# ---------------------------------------------------------------------------

def test_build_weakform_thermal(env):
    reg, tb = env
    # -k (δT_,i, T_,i) + (δT, s); k=3
    k = 3.0
    wf = add([
        mul([-k, bilinear_term(W("T", sd=("i",)), W("T", sd=("i",)))]),
        bilinear_term(W("T"), W("s")),
    ])
    forms = build_weakform(tb, wf)
    by_dual = {f.dual_word: f.base_term for f in forms}
    assert W("T") in by_dual and by_dual[W("T")] == W("s")
    for d in (1, 2):
        w = W("T", sd=(d,))
        assert w in by_dual
        assert by_dual[w] == simplify_common(mul([-3.0, W("T", sd=(d,))]))


def test_build_weakform_coefficient_distribution(env):
    reg, tb = env
    # 2 * Bilinear(T, T) -> base term 2*T
    forms = build_weakform(
        tb, construct_term("*", [2.0, bilinear_term(W("T"), W("T"))]))
    assert len(forms) == 1
    assert forms[0].base_term == simplify_common(mul([2.0, W("T")]))


def test_weakform_dual_sum(env):
    reg, tb = env
    # Bilinear(T + T^2, s): variation gives δT(1 + 2T)
    forms = build_weakform(
        tb, bilinear_term(add([W("T"), pow_(W("T"), 2.0)]), W("s")))
    assert len(forms) == 1
    f = forms[0]
    assert f.dual_word == W("T")
    expect = simplify_common(
        mul([add([1.0, mul([2.0, W("T")])]), W("s")]))
    assert f.base_term == expect


# ---------------------------------------------------------------------------
# naming
# ---------------------------------------------------------------------------

def test_word_to_sym():
    assert word_to_sym(2, "T", 0, (), ()) == "T"
    assert word_to_sym(2, "T", 1, (), ()) == "T_t"
    assert word_to_sym(2, "u", 0, (2,), ()) == "u2"
    assert word_to_sym(2, "u", 0, (1,), (1, 2)) == "u1_12"
    assert word_to_sym(2, "sig", 0, (1, 2), (), symmetric=True) == "sig3"
    assert word_to_sym(3, "sig", 0, (1, 3), (), symmetric=True) == "sig5"


def test_api_expression_building(env):
    reg, tb = env
    T = SymRef("T", reg)
    s = SymRef("s", reg)
    wf = -3.0 * Bilinear(T.d("i"), T.d("i")) + Bilinear(T, s + 0.0)
    forms = build_weakform(tb, as_term(wf))
    assert len(forms) == 3  # T, T_x1, T_x2


# ---------------------------------------------------------------------------
# user-extensible rules (the reference's @Define_Rewrite_Rule /
# DIFF_RULES surface, 05_Syntactic_Structure.jl:116-160 /
# 09_Differentiation.jl:4-13 — re-expressed as plain-Python hooks)
# ---------------------------------------------------------------------------

def test_register_rewrite_rule():
    from metafem.symbolics import (register_rule, registered_rules,
                                   unregister_rule)
    from metafem.symbolics.ir import Term, call

    def sq_to_product(t):
        if isinstance(t, Term) and t.op == "sq":
            return mul([t.subterms[0], t.subterms[0]])
        return None

    name = register_rule(sq_to_product)
    try:
        assert "sq_to_product" in registered_rules()
        # rewrites at any depth and feeds back into the merger:
        # 3*sq(T) + T^2  ->  4*T^2
        t = simplify_common(add([mul([3.0, call("sq", W("T"))]),
                                 pow_(W("T"), 2.0)]))
        assert t == mul([4.0, pow_(W("T"), 2.0)])
    finally:
        unregister_rule(name)
    assert "sq_to_product" not in registered_rules()
    # rule gone: sq stays opaque
    t = simplify_common(call("sq", W("T")))
    assert isinstance(t, __import__("metafem").symbolics.ir.Term)
    assert t.op == "sq"


def test_rewrite_rule_cycle_raises():
    from metafem.symbolics import register_rule, unregister_rule
    from metafem.symbolics.ir import Term, call

    def ping(t):
        if isinstance(t, Term) and t.op == "ping":
            return call("pong", *t.subterms)
        return None

    def pong(t):
        if isinstance(t, Term) and t.op == "pong":
            return call("ping", *t.subterms)
        return None

    n1, n2 = register_rule(ping), register_rule(pong)
    try:
        with pytest.raises(ValueError, match="fixpoint"):
            simplify_common(call("ping", W("T")))
    finally:
        unregister_rule(n1)
        unregister_rule(n2)


def test_builtin_function_chain_rules(env):
    reg, tb = env
    from metafem.symbolics.ir import call

    # d/dx exp(T) = T_;x * exp(T)
    t = diff_space(call("exp", W("T")), 1, tb)
    assert t == mul([W("T", sd=(1,)), call("exp", W("T"))])
    # d/dx sin(T) = T_;x * cos(T)
    t = diff_space(call("sin", W("T")), 1, tb)
    assert t == mul([W("T", sd=(1,)), call("cos", W("T"))])


def test_register_diff_rule(env):
    reg, tb = env
    from metafem.symbolics import register_diff_rule
    from metafem.symbolics.diff import DIFF_RULES
    from metafem.symbolics.ir import call

    # a custom scalar op with a user-supplied chain rule:
    # softplus'(x) = sigmoid(x)
    register_diff_rule(
        "softplus", lambda s, d: mul([d(s[0]), call("sigmoid", s[0])]))
    try:
        t = diff_space(call("softplus", W("T")), 2, tb)
        assert t == mul([W("T", sd=(2,)), call("sigmoid", W("T"))])
        # variation flows through the same rule
        v = diff_variation(call("softplus", W("T")), tb)
        dv = construct_term("var_delta", [W("T")])
        assert v == mul([dv, call("sigmoid", W("T"))])
    finally:
        DIFF_RULES.pop("softplus", None)


def test_diff_unknown_op_message(env):
    reg, tb = env
    from metafem.symbolics.ir import call
    with pytest.raises(ValueError, match="register_diff_rule"):
        diff_space(call("mystery", W("T")), 1, tb)
