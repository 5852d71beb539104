"""Bit-for-bit prompt parity against the reference prompter modules.

Loads the reference prompter files standalone (they are pure-string code with
no torch dependency) and checks our table-driven builders emit identical
prompts for multi-turn conversations.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/merv/models/backbones/llm/prompting")


def _load_ref_module(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    base = _load_ref_module("merv.models.backbones.llm.prompting.base_prompter", REF / "base_prompter.py")
    # parent package stubs so the absolute imports inside the files resolve
    for pkg in [
        "merv",
        "merv.models",
        "merv.models.backbones",
        "merv.models.backbones.llm",
        "merv.models.backbones.llm.prompting",
    ]:
        sys.modules.setdefault(pkg, type(sys)(pkg))
    sys.modules["merv.models.backbones.llm.prompting.base_prompter"] = base
    llama2 = _load_ref_module("_ref_llama2_prompter", REF / "llama2_chat_prompter.py")
    qwen2 = _load_ref_module("_ref_qwen2_prompter", REF / "qwen2_prompter.py")
    vicuna = _load_ref_module("_ref_vicuna_prompter", REF / "vicuna_v15_prompter.py")
    return {
        "pure": base.PurePromptBuilder,
        "llama2-chat": llama2.LLaMa2ChatPromptBuilder,
        "llama3-1": llama2.LLaMa31PromptBuilder,
        "qwen2": qwen2.Qwen2PromptBuilder,
        "vicuna": vicuna.VicunaV15ChatPromptBuilder,
    }


def _ours():
    from merv_tpu.models.backbones.llm.prompting import (
        LLaMa2ChatPromptBuilder,
        LLaMa31PromptBuilder,
        PurePromptBuilder,
        Qwen2PromptBuilder,
        VicunaV15ChatPromptBuilder,
    )

    return {
        "pure": PurePromptBuilder,
        "llama2-chat": LLaMa2ChatPromptBuilder,
        "llama3-1": LLaMa31PromptBuilder,
        "qwen2": Qwen2PromptBuilder,
        "vicuna": VicunaV15ChatPromptBuilder,
    }


CONVO = [
    ("human", "<image>\nWhat is happening in this video?"),
    ("gpt", "A dog is chasing a ball in the park."),
    ("human", "What color is the ball?"),
    ("gpt", ""),
    ("human", "Are you sure?"),
    ("gpt", "Yes, it is red."),
]


@pytest.mark.parametrize("style", ["pure", "llama2-chat", "llama3-1", "qwen2", "vicuna"])
def test_prompt_parity_multi_turn(ref, style):
    ref_b = ref[style]("merv")
    our_b = _ours()[style]("merv")

    for role, msg in CONVO:
        ref_wrapped = ref_b.add_turn(role, msg)
        our_wrapped = our_b.add_turn(role, msg)
        assert our_wrapped == ref_wrapped, f"{style}: wrapped turn mismatch"
        assert our_b.get_prompt() == ref_b.get_prompt(), f"{style}: prompt mismatch after {role} turn"


@pytest.mark.parametrize("style", ["pure", "llama2-chat", "vicuna"])
def test_potential_prompt_parity(ref, style):
    ref_b = ref[style]("merv")
    our_b = _ours()[style]("merv")
    assert our_b.get_potential_prompt("Hi there") == ref_b.get_potential_prompt("Hi there")
    for role, msg in CONVO[:2]:
        ref_b.add_turn(role, msg)
        our_b.add_turn(role, msg)
    assert our_b.get_potential_prompt("Next question?") == ref_b.get_potential_prompt("Next question?")


@pytest.mark.parametrize("style", ["pure", "llama2-chat", "vicuna"])
def test_custom_system_prompt(ref, style):
    if style == "pure":
        pytest.skip("pure builder has no system prompt")
    ref_b = ref[style]("merv", system_prompt="Custom system.")
    our_b = _ours()[style]("merv", system_prompt="Custom system.")
    ref_b.add_turn("human", "hello")
    our_b.add_turn("human", "hello")
    assert our_b.get_prompt() == ref_b.get_prompt()


def test_turn_alternation_enforced():
    from merv_tpu.models.backbones.llm.prompting import PurePromptBuilder

    b = PurePromptBuilder("merv")
    with pytest.raises(AssertionError):
        b.add_turn("gpt", "I speak first")
