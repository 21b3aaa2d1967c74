"""Template table parity: our generated list must byte-match the reference's."""

import re

from synergy_tpu.data.templates import TEMPLATES, ZS_AUDIO_PROMPT, ZS_IMAGE_PROMPT

REFERENCE_DATASET = "/root/reference/dataset.py"


def _reference_templates():
    src = open(REFERENCE_DATASET).read()
    m = re.search(r"TEMPLATES = \[(.*?)\n\]", src, re.S)
    items = re.findall(r"'([^']*)'|\"([^\"]*)\"", m.group(1))
    return [a or b for a, b in items if "{}" in (a or b)]


def test_templates_match_reference():
    ref = _reference_templates()
    assert TEMPLATES == ref
    assert len(TEMPLATES) == 72


def test_zs_prompts():
    assert ZS_IMAGE_PROMPT.format("dog") == "this is a photo of dog"
    assert ZS_AUDIO_PROMPT.format("rain") == "this is a sound of rain"
