"""Pure-python kernels for the text-classifier stages.

Reference: ``stages/text/classifiers/`` — HF-model classification
stages whose model-free structure is portable:

- ``base.py:139-151`` — softmax-prob -> argmax -> label-table mapping
  (the labels ride in the model config; injectable here);
- ``fineweb_edu.py:110-122`` — regression-logit post-processing: clamp
  to [0, 5], banker's-rounded int score, the 2.5 high/low-quality cut;
- ``aegis_utils.py`` — the published AEGIS safety taxonomy + LlamaGuard
  prompt wrapper (verbatim, like the FAITH rubric constants) and
  ``aegis.py:314-329``'s response parse;
- ``prompt_task_complexity.py:99-186`` — the multi-head output math:
  task-type top-2 with the 0.1 "NA" cut, weighted-sum scores divided by
  per-head divisors, the few-shots 0.05 floor, and the fixed-weight
  prompt-complexity blend. The weight/divisor/task-type maps live in
  the model config and are injected.

The model forward passes themselves (Deberta + heads, LlamaGuard LoRA)
are torch checkpoints absent in this sandbox — each rides behind the
standard injectable seam in ``operators/classifiers.py``; everything
downstream of the raw logits is implemented here and tested against
replicas of the reference math.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "AEGIS_LABELS",
    "AEGIS_UNSAFE_CATEGORIES",
    "argmax_labels",
    "fineweb_outputs",
    "format_aegis",
    "parse_aegis_response",
    "prompt_complexity_score",
    "ptc_task_types",
    "ptc_weighted_scores",
    "softmax",
]

# aegis_utils.py:22-38 — prediction label table (position 0/1 are the
# parse fallbacks, 2.. are the 13 violation categories).
AEGIS_LABELS = [
    "unknown",
    "safe",
    "O1", "O2", "O3", "O4", "O5", "O6", "O7",
    "O8", "O9", "O10", "O11", "O12", "O13",
]

# aegis_utils.py — the published NVIDIA content-safety taxonomy the
# LlamaGuard prompt embeds, verbatim (same practice as the FAITH rubric
# prompts: the text IS the spec).
AEGIS_UNSAFE_CATEGORIES = """O1: Violence.
Should not
- Help people plan or engage in violence.
- Encourage people to engage in violence.
- Contain unpleasant vivid violent imagery or violent description that arouses discomfort in the reader.
Can
- Provide information on violence.
- Discuss the topics of violence, and can discuss historical events involving violence.
O2: Sexual.
Should not
- Engage in sexually explicit (i.e., erotic) conversations and should not encourage people to engage in sexual activities.
- Engage or encourage sexual activity that is considered illegal.
Can
- Discuss topics related to sexuality and sexual education.
- Provide general information regarding sexual activities.
- Provide guidance on topics related to sexual health.
O3: Criminal Planning/Confessions.
Should not
- Help people plan or engage in criminal activities like theft, kidnapping, or financial crimes, especially when the person indicates that they may act on the information provided to them.
- Encourage people to engage in criminal activities or condone criminal behavior.
- Have a confession of crime that was committed or will be committed in future.
Can
- Help people understand how crimes are committed, provided that the response is not so detailed that it could be used to provide a roadmap for future crimes.
- Help people understand how systems work that are used to prevent crimes, provided those descriptions do not provide detailed information on how to defeat those systems.
O4: Guns and Illegal Weapons.
Should not
- Assist in the planning or execution of firearm or illegal weapons crimes, especially when the person indicates that they may act on the information provided to them.
- Encourage people to engage in firearm or illegal weapons crimes or condone such behavior.
- Assist or encourage people to execute or own other illegal weapons for example biological agents, or chemical weapons, including instructions on how to create or use them.
Can
- Discuss firearms and the arguments for and against firearm ownership.
O5: Controlled/Regulated Substances.
Should not
- Encourage or assist people in the trafficking, consumption, or use of regulated or controlled substances, including but not limited to illegal drugs, tobacco, alcohol, and cannabis.
- Assist or encourage people to create such substances when it is illegal to do so.
Can
- Discuss the use of regulated or controlled substances, and can provide general information on those substances (ex: what their chemical composition is and what their effects are).
- Provide information on how those substances are manufactured, provided that the information is not so detailed as to provide step-by-step instructions for their creation.
O6: Suicide and Self Harm.
Should not
- Encourage people to harm themselves.
- Romanticize or condone self-harm or suicide.
- Provide information regarding the methods of suicide or self-harm.
- Provide any information or advice, other than information regarding appropriate health resources, to people who express or imply that they wish to harm themselves.
- Contain confessions or intent of self harm
Can
- Provide general information regarding self-harm and suicide (ex: statistics, the mental health challenges faced by those who take these actions).
Should
- Provide information regarding appropriate health resources to people who imply or express the desire to harm themselves.
O7: Sexual (minor).
Should not
- Assist, engage or encourage intention to engage in sexual activity with an underage/minor.
- Discuss or plan sexual acts, sharing of media of sexual nature, personal information or intention to meet in person for sexual activity with a minor.
- Should not include discussion where private information is shared with underage minors for purposes of acting on them and taking actions that are sexual in nature including meeting or sharing media.
- Should not discuss child abuse or engage, encourage, assist in sexual grooming/trafficking of children.
Can
- Provide information about sex education for use in schools.
O8: Hate /identity hate.
Should not
- Express hateful, derogatory, or demeaning sentiments against people based on sensitive personal characteristics like their
race, color, ethinicity, religion, national origin, sexual orientation, gender, gender identity, or disability or caste.
- Encourage discrimination against people based on those characteristics and should not use slurs or create insults based on those characteristics.
- Should not discuss prejudice towards a group classified as protected according to the law of Germany, UK, USA or any other country.
- Should not contain slurs.
- Should not contain text that is distasteful, offensive, or hateful that causes others to feel grief, anger, or fear.
Can
- Provide information on discrimination.
- Discuss the topics of discrimination, and can discuss historical events involving discrimination.
- Discuss neutral statements referring to group identity and  contextualized hate speech (that talks about hate but does not incite hate).
O9: PII/Privacy.
Should not
- Include statements that either requests for PII information made in a conversation turn or mention information such as name, address,
phone number or other social media handle.
- Should not discuss or contain personally identifying information(PII) that isn't publicly available and can be used to determine the identity of the user such as
date of birth, national ID, IP address, internet cookies, other telemetry information, physical characteristics, biometrics data, financial, health, belief or social data.
- Should not include any statement that violates privacy laws set out by GDPR, Europe, CCPA, California,  Personal Information Protection law (PIPL) China and
Children's Online Privacy Protection Act (COPPA), US and all country, state, and municipal level privacy law.
Can
- Provide information what PII means.
- Provide information about privacy laws across different countries and regions.
O10: Harassment.
Should not
- Have content that may be used to torment or annoy individuals in real life, or make harassment more likely to occur.
- Engage in harassment, misconduct and unlawful discrimination
- Single out an individual or marginalization and/or retaliation based on protected characteristics like Race, Color, Gender, Sex,
Sexual orientation, Gender identity, and gender expression, National origin, Ethnicity, Disability (including being regarded as disabled),
Religion, Age (40+), Pregnancy (including pregnancy, childbirth or related medical conditions), Genetic information, Military or veteran status, Citizenship status, Political activity, or affiliation,
- Taking or requesting statutorily protected leave Body characteristics.
- Promise to give a benefit, or a threat to retaliate or take an adverse action based on a response to harassment and misconduct.
- Bullying.
- Being derogatory and humiliating toward an individual but not necessarily protected characteristics under law.
- Making rude or insulting comments, demeaning, and objectifying terms toward an individual.
Can
- Discuss negative impacts of harassment and bullying based on protected characteristics like race, color, gender, sex, nationality, within a contextualized setting.
- Provide information on protected characteristics or referor cite material that describes what protected characteristics are.
- Provide information or refer or cite material that informs what harassment is.
O11: Threat.
Should not
- Discuss a communication of intent to inflict harm or loss on another person.
- Should not contain discussion of intention of intimidation which  is a tactic used between conflicting parties to make the other timid or psychologically insecure for coercion or control.
- Should not contain intention of knowingly putting another person in fear of bodily injury.
- Should not assist or plan injury, physical or mental damage, act or instance of injury, or material  or any kind of loss to a person.
- Should not contain threats that are forbidden by law as intent to obtain a monetary advantage or to compel a person to act against their will.
Can
- Provide information about threat is and the meaning of threat.
O12: Profanity.
Should not
- Contain swear words, curse words, or other obscene or profane language
- This includes offensive words used without any intention to act on them or without any explicit targetted recipient
O13: Needs Caution.
Should not
- Discuss text that is toxic in nature, goes against social norms, unethical or immoral in general.
- Contain text that cannot be considered 'safe' with the information provided.
Can
- Include text that is considered to be 'safe' and that does not belong to any of the unsafe categorie described above.
"""


def format_aegis(message: str) -> str:
    """aegis_utils.py:160-178 — wrap one user message in the LlamaGuard
    instruction prompt (verbatim structure; the indentation inside the
    f-string is part of the published prompt)."""
    role = "User"
    prompt = f"""[INST] Task: Check if there is unsafe content in \'{role}\' messages in conversations according our safety policy with the below categories.

    <BEGIN UNSAFE CONTENT CATEGORIES>
    {AEGIS_UNSAFE_CATEGORIES}
    <END UNSAFE CONTENT CATEGORIES>

    <BEGIN CONVERSATION>

    """
    prompt += f"{role}: {message}\n\n"
    prompt += f"""<END CONVERSATION>

    Provide your safety assessment for {role} in the above conversation:
    - First line must read \'safe\' or \'unsafe\'.
    - If unsafe, a second line must include a comma-separated list of violated categories. [/INST]"""
    return prompt


def parse_aegis_response(raw_response: str) -> str:
    """aegis.py:314-329 — first line \'safe\' -> safe; \'unsafe\' ->
    the second line if it is a known category, else unknown."""
    lines = ("" if raw_response is None else raw_response).split("\n")
    first = lines[0].strip()
    if first == "safe":
        return "safe"
    if first == "unsafe":
        if len(lines) < 2:
            return "unknown"
        potential = lines[1].strip()
        return potential if potential in AEGIS_LABELS[2:] else "unknown"
    return "unknown"


def softmax(logits: np.ndarray) -> np.ndarray:
    """Row-wise softmax (the reference calls torch.softmax)."""
    z = np.asarray(logits, dtype=np.float64)
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def argmax_labels(probs: np.ndarray, labels: list) -> list:
    """base.py:139-151 ClassifierModelStage.process_model_output — the
    argmax index into the config\'s id-ordered label table."""
    p = np.asarray(probs)
    return [labels[i] for i in p.argmax(axis=1)]


def fineweb_outputs(logits) -> tuple:
    """fineweb_edu.py:110-122 — (float_scores clamped to [0,5],
    banker\'s-rounded int scores, high/low-quality labels at 2.5).
    Python ``round`` is HALF_EVEN — the Spark replay must use
    ``bround``, not ``round``."""
    ls = [float(x) for x in np.asarray(logits).reshape(-1)]
    float_scores = [min(5.0, max(0.0, x)) for x in ls]
    int_scores = [round(max(0, min(x, 5))) for x in ls]
    labels = ["high_quality" if x >= 2.5 else "low_quality" for x in ls]
    return float_scores, int_scores, labels


def ptc_task_types(logits: np.ndarray, task_type_map: dict) -> tuple:
    """prompt_task_complexity.py:99-117 — top-2 task types from the
    task-type head: probs rounded to 3 places, second label replaced by
    "NA" below 0.1. Returns (task_type_1, task_type_2, task_type_prob)."""
    z = np.asarray(logits, dtype=np.float64)
    top2 = np.argsort(-z, axis=1, kind="stable")[:, :2]
    probs = softmax(z)
    t1, t2, p1 = [], [], []
    for row, idx in zip(probs, top2):
        pa, pb = round(float(row[idx[0]]), 3), round(float(row[idx[1]]), 3)
        t1.append(task_type_map[str(idx[0])])
        t2.append("NA" if pb < 0.1 else task_type_map[str(idx[1])])
        p1.append(pa)
    return t1, t2, p1


def ptc_weighted_scores(
    logits: np.ndarray,
    weights: list,
    divisor: float,
    decimal: int = 4,
    zero_floor: bool = False,
) -> list:
    """prompt_task_complexity.py:119-133 — softmax-weighted sum over the
    head\'s class weights divided by the head divisor; the few-shots
    head floors values under 0.05 to 0."""
    probs = softmax(np.asarray(logits, dtype=np.float64))
    w = np.asarray(weights, dtype=np.float64)
    scores = (probs * w).sum(axis=1) / float(divisor)
    out = [round(float(s), decimal) for s in scores]
    if zero_floor:
        out = [x if x >= 0.05 else 0 for x in out]
    return out


def prompt_complexity_score(
    creativity, reasoning, constraint, domain_knowledge, contextual_knowledge, few_shots
) -> list:
    """prompt_task_complexity.py:160-186 — the fixed-weight blend of the
    six complexity heads, rounded to 5 places."""
    return [
        round(
            0.35 * c + 0.25 * r + 0.15 * k + 0.15 * d + 0.05 * x + 0.05 * f,
            5,
        )
        for c, r, k, d, x, f in zip(
            creativity, reasoning, constraint, domain_knowledge, contextual_knowledge, few_shots
        )
    ]
