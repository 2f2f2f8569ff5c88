"""The one registry of published prompt constants, verbatim.

Every LLM-prompt and policy-text constant the reference ships as data —
the Nemotron-CC synthetic-generation templates
(``stages/synthetic/nemotron_cc/prompts.py``), the AEGIS/LlamaGuard
content-safety taxonomy (``stages/text/classifiers/aegis_utils.py``),
the translation prompt pair
(``stages/text/experimental/translation/prompts/translate.yaml``), and
the FAITH evaluation rubric (``.../prompts/faith_eval.yaml``) — lives
HERE, in one module, for three reasons:

1. **The text IS the spec.** These are Apache-2.0 published data
   constants; behavioral parity with the reference requires feeding the
   SAME bytes to the same model (like the BS.1770 coefficient table or
   the Mersenne-prime seed schedule) — a paraphrase would be a
   different program.
2. **One provenance point.** Each constant cites its reference file
   here once; consumers (``kernels/synthetic.py``,
   ``kernels/classifiers.py``, ``kernels/translation.py``,
   ``load_prompt_template``) re-export for their local API surface.
3. **Prompt updates land once.** When the reference revs a prompt, one
   module diff covers every stage that embeds it.

Nothing in this module is executable logic — constants only.
"""

from __future__ import annotations

__all__ = [
    "AEGIS_UNSAFE_CATEGORIES",
    "OCR_BBOX_TO_TEXT_TEMPLATES",
    "OCR_POINT_TO_WORD_QUESTION_TEMPLATES",
    "OCR_SCORING_PROMPT_TEMPLATE",
    "OCR_SDG_PROMPT_VARIATIONS",
    "OCR_TEXT_TO_BBOX_MULTI_BASES",
    "OCR_TEXT_TO_BBOX_SINGLE_BASES",
    "OCR_TEXT_TO_POINT_BASES",
    "OCR_TEXT_TO_POINT_MULTI_BASES",
    "DISTILL_PROMPT_TEMPLATE",
    "DIVERSE_QA_PREFIX",
    "DIVERSE_QA_PROMPT_TEMPLATE",
    "EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE",
    "FAITH_EVAL_SYSTEM_PROMPT",
    "FAITH_EVAL_USER_TEMPLATE",
    "KNOWLEDGE_LIST_PROMPT_TEMPLATE",
    "NEMOTRON_CC_DISTILL_SYSTEM_PROMPT",
    "NEMOTRON_CC_SYSTEM_PROMPT",
    "TRANSLATE_SYSTEM_PROMPT",
    "TRANSLATE_USER_TEMPLATE",
    "WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE",
]

# ---------------------------------------------------------------------------
# stages/synthetic/nemotron_cc/prompts.py — the Nemotron-CC generation
# prompts (system prompts + five task templates).

NEMOTRON_CC_SYSTEM_PROMPT = (
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the questions."
)

NEMOTRON_CC_DISTILL_SYSTEM_PROMPT = (
    "You are an artificial intelligence assistant. You carefully provide "
    "accurate, factual, thoughtful, nuanced answers, and are brilliant at "
    "reasoning."
)

WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE = """For the following paragraph give me a diverse paraphrase of the same in high quality English language as in sentences on Wikipedia. Begin your answer on a separate line with "Here is a paraphrased version:".

Text: {document}"""

DIVERSE_QA_PROMPT_TEMPLATE = """Task:
Read the text, ask questions and answer them.

Follow these instructions:
1. Ask diverse questions that require different cognitive skills or cover different aspects of the text.
2. Ask questions in various forms such as:
  - Yes/No questions that require determining whether a statement is true or false.
  - Open-ended questions that begin with words like what, how, when, where, why and who.
  - Multi-choice questions that offers two or more options to choose from. Include the options in the question.
  - Comparison questions that compare two quantities or objects and determine the relationship between them.
  - Reading comprehension questions that test the ability to understand and analyze the text.
  - Problem-solving questions that test the ability to solve mathematical, physical, or logical problems.
3. Focus on asking questions about factual information, important knowledge, or concrete details in the text.
4. Write questions and answers using clear and concise language.
5. Use plain text. Do not use Markdown.
6. Each question and answer pair should be on a separate line. Tag the question with "Question:" and the answer with "Answer:".

Text:
{document}

Task:
After reading the above text, ask up to 8 questions and provide the correct answers following the instructions. Give your response in this format:

Here are the questions and answers based on the provided text:
- Question: [first question] Answer: [first answer]
- Question: [second question] Answer: [second answer]
...."""

DISTILL_PROMPT_TEMPLATE = """Your task is to read and paraphrase the provided text following these instructions:
- Aim to create a condensed but accurate and informative version of the original text, not a simplistic summary.
- Capture and preserve the crucial information, key concepts, important values, factual details in the original text, while making it more readable and accessible.
- Retain technical terms, specialized vocabulary, and complex concepts.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Only include information that is present in the original text. Do not adding new or unsubstantiated claims.
- Write the text in plain text without formatting.

Here is the text:
{document}

Task:
After thoroughly reading the above text, paraphrase it in high-quality and clear English following the instructions. Begin your response with "Paraphrased Text:"."""

EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE = """Your task is to rewrite knowledge from the provided text following these instructions.
- Rewrite the text as a passage or passages using easy-to-understand and high-quality English like sentences in textbooks and Wikipedia.
- Focus on content in disciplines such as humanities, social sciences, natural sciences, technology, engineering, math, law and legal, business, management, art, education, agricultural sciences, politics, and history.
- Disregard content that does not contain useful facts or knowledge.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Do not add or alter details. Only restate what is already in the text.
- Write in plain text.
- Do not add titles, subtitles, note, or comment.

Text:
{document}

Task:
Rewrite facts and knowledge from the above text as a passage or passages following the instructions."""

KNOWLEDGE_LIST_PROMPT_TEMPLATE = """Review the text and extract the key information. Follow these instructions:
- Carefully read the above text and provide a concise and organized list of factual information, concrete details, key concepts, and important numbers and statistics extracted from the text.
- Ensure each point is clear, specific, and supported by the original text.
- Ensure the extract text is information-dense and easier to learn from.
- Do not add titles or headings.

Text:
{document}

Task:
Extract the factual information, concrete details, and key concepts from the above text following the instructions."""

# nemotron_cc.py:74 — the literal response preamble DiverseQA strips.
DIVERSE_QA_PREFIX = "Here are the questions and answers based on the provided text:"

# ---------------------------------------------------------------------------
# stages/text/classifiers/aegis_utils.py — the published NVIDIA
# content-safety taxonomy the LlamaGuard prompt embeds
# (kernels/classifiers.format_aegis builds the full instruction prompt).

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

# ---------------------------------------------------------------------------
# stages/text/experimental/translation/prompts/translate.yaml — the
# translate prompt pair (format slots: {source_lang}/{target_lang}/{src},
# translate.py:410-417).

TRANSLATE_SYSTEM_PROMPT = (
    "You are an experienced translator that translates documents "
    "accurately into fluent text in target language."
)
TRANSLATE_USER_TEMPLATE = (
    "You need to translate some {source_lang} source text to "
    "{target_lang}, with the following exceptions:\n\n"
    "(1) If the source text contains XML tags, URLs, or math formulas, "
    "copy them as-is.\n"
    "(2) If the source text contains any computer code (e.g. C++ or "
    "Python), copy the content as-is.\n\n"
    "Wrap the translated text in brackets〘〙.\n\n"
    "{source_lang}: {src}"
)

# ---------------------------------------------------------------------------
# stages/text/experimental/translation/prompts/faith_eval.yaml — the
# FAITH rubric pair ({{/}} are str.format escapes for literal JSON
# braces).

FAITH_EVAL_SYSTEM_PROMPT = """You are a world-renowned professor teaching {target_language} to foreign students. You are evaluating the quality of a translation from {source_language} to {target_language}.

Your task is to evaluate the quality of the translation. You will provide a score from 1 to 5 (with 1=poor and 5=excellent) across all categories of the FAITH metric:

{{
  "Fluency": score,
  "Accuracy": score,
  "Idiomaticity": score,
  "Terminology": score,
  "Handling_of_Format": score
}}

Here are the categories:

1. **Fluency (1-5)**: Does the translation read naturally in the target language, free from grammar or syntax errors?
   - 1: Very poor fluency, difficult to understand.
   - 2: Somewhat fluent but with major grammatical issues.
   - 3: Generally fluent with a few errors.
   - 4: Mostly fluent but may have minor grammatical issues.
   - 5: Perfect grammar, native-like fluency.

2. **Accuracy (1-5)**: How well does the translation preserve the meaning of the source sentence?
   - 1: Meaning significantly changed or lost.
   - 2: Major inaccuracies, important meanings are omitted.
   - 3: Some meaning preserved, but there are notable inaccuracies.
   - 4: Meaning mostly preserved with minor issues.
   - 5: Meaning fully preserved.

3. **Idiomaticity (1-5)**: Are the phrases idiomatic and natural for the target language, fitting its cultural context?
   - 1: Literal translation, very awkward for native speakers.
   - 2: Some idiomatic phrases but mostly awkward.
   - 3: Mixed idiomaticity, some phrases fit while others don't.
   - 4: Mostly idiomatic, with a few non-native phrases.
   - 5: Completely idiomatic and culturally appropriate.

4. **Terminology (1-5)**: Are any specialized terms translated accurately? (If no specialized terms, note as N/A.)
   - 1: Significant errors in terminology.
   - 2: Some incorrect terminology affecting understanding.
   - 3: Mostly correct terminology but with some inconsistencies.
   - 4: All terms correctly translated with minor inconsistencies.
   - 5: All terms correctly and consistently translated.

5. **Handling of Format (1-5)**: Is the formatting (punctuation, capitalization, non-translatable elements) correctly maintained?
   - 1: Significant formatting errors or omissions.
   - 2: Major formatting issues that affect readability.
   - 3: Some formatting errors, but generally readable.
   - 4: Minor formatting issues but mostly preserved.
   - 5: Format fully preserved.

In case there is no translation provided, give -1 to all the categories!
If case of non-applicable score, make the score=0

Return ONLY a single valid JSON object. Do NOT include code fences, backticks, comments, or explanations. Output must begin with '{{' and end with '}}'."""

FAITH_EVAL_USER_TEMPLATE = """Provide FAITH score for each category for the following translation:

***
Source text ({source_language})
***
{source_text}
***
Translated text ({target_language})
***
{translated_text}
***

Remember, DO NOT output any explanatory text. Just reply with properly formatted JSON with scores."""

# ---------------------------------------------------------------------------
# stages/synthetic/omni/ocr_scoring_qa.py:48-85 — the OCR verifier
# prompt (format slot: {bboxes_json}; literal JSON braces doubled).

OCR_SCORING_PROMPT_TEMPLATE = """\
Please check if the following OCR bounding boxes are correct and respond ONLY with JSON \
in this exact format:
{{
  "ocr_mode": "word" or "line",
  "text": [
    {{
      "idx": <integer matching input idx>,
      "is_word": <true if bbox covers a single word>,
      "is_line": <true if bbox covers a full line, phrase, or sentence>,
      "bbox_match": <0-10>,
      "text_errors": <integer>
    }}
  ],
  "missing_text": [
    {{
      "text": "<transcribed text>",
      "bbox_2d": [y1, x1, y2, x2]
    }}
  ]
}}

Scoring guide:
- ocr_mode: set to "word" if every bbox covers a single word; "line" if bboxes cover \
phrases, lines, or sentences
- bbox_match: 10 = bbox fits tightly around the text; 5 = bbox is ~1 character too \
large/small/shifted; 0 = completely wrong position or size
- text_errors: 0 = transcription matches the image exactly; count each substitution, \
insertion, or deletion as 1 error
- missing_text: list every legible text region visible in the image that is NOT covered \
by any of the provided bounding boxes, together with its estimated bbox_2d

Text and bounding boxes to check (bbox_2d is [y1, x1, y2, x2] on a 0-1000 normalised grid):
{bboxes_json}

Only output valid JSON."""

# ---------------------------------------------------------------------------
# stages/synthetic/omni/ocr_conversationalize.py:31-66 — the dense-OCR
# question variations (the SDG "transcribe every word" instruction pool).

OCR_SDG_PROMPT_VARIATIONS = (
    "Perform a word-level transcription of the image.",
    "Detect every word in the image.",
    "Extract all text at the word level and map each to its specific region.",
    "Generate a word-level OCR output for this image.",
    "List all words found in the image along with their bounding boxes.",
    "Find all text regions at the word level. Each entry should have text and bbox.",
    "Map every word in the image to its bounding box.",
    "Provide a word-level transcription of this image.",
    "Capture every word and its corresponding bounding box within the image.",
    "For every word visible, provide the text and its bounding box.",
    "Identify the bounding boxes for all words in the image.",
    "Provide a detailed word-level transcription. Each word should have a bbox.",
    "Locate all words in the image and define their areas.",
    "Execute a word-level OCR. Each item should include text and bbox.",
    "Extract text word-by-word from the image. For each, specify the bounding box.",
    "Identify the bounding box for every individual word in the image. Output the text and coordinates.",
    "Identify all text at the word level.",
    "Scan the image for words and provide their bounding boxes.",
    "Transcribe every word found in the image.",
    "Detect individual word regions and their contents.",
    "Map each word in the image to its respective crop.",
    "Perform word-level OCR. Each item should have text and bbox.",
    "List every word found in the image with its bounding box.",
    "Capture the area of every word in the image.",
    "For all words in the image, provide the text and its bounding box.",
    "Provide a word-level breakdown of the text in this image.",
    "Find all word regions.",
    "List the bounding boxes for all words.",
    "Extract each word's text and its region.",
    "Transcribe every word in this image.",
    "For every word detected, provide text and its bbox.",
    "Transcribe all text at a word-specific level.",
    "Perform a word-level scan of the image.",
)

# ---------------------------------------------------------------------------
# stages/synthetic/omni/ocr_dense_qa.py:163-300 — the QA question
# template pools (pure strings; the answer FORMATTERS are code and live
# in kernels/ocrqa.py).

OCR_BBOX_TO_TEXT_TEMPLATES = (
    "What text is in the bounding box {}?",
    "Read the text at bounding box {}.",
    "What does the text say in the region {}?",
    "Give me the text content inside the box {}.",
    "What is the text at coordinates {}?",
    "Write out the text in the region {}.",
    "Look at the bounding box {}. What does it say?",
    "Extract the text from the area {}.",
    "What word or text is located at {}?",
    "Describe the text content in the box {}.",
)

OCR_TEXT_TO_POINT_BASES = (
    "Point at the text {}.",
    "Indicate the center of the text {}.",
    "Where is the center of {}? Give the point.",
    "Click on the text {}. What are the coordinates of that point?",
    "Point to where the text {} is located.",
)

OCR_TEXT_TO_POINT_MULTI_BASES = (
    "Point at every occurrence of the text {}.",
    "Indicate the center of each instance of {} in the image.",
    "Where are all the centers of {}? List each point.",
    "Give the center point for every place where {} appears.",
    "Click on each occurrence of {}. What are the coordinates of those points?",
    "List the center coordinates for each time {} appears in the image.",
)

OCR_POINT_TO_WORD_QUESTION_TEMPLATES = (
    "Which word is at the point {}?",
    "What word is at the coordinates {}?",
    "What does the image say at point {}?",
    "Identify the word at location {}.",
    "What word is located at {}?",
    "Read the word at the point {}.",
    "Which word appears at coordinates {}?",
    "What is the word at {}?",
    "Tell me the text at point {}. Just give the single word.",
    "What character or word is at {}?",
)

OCR_TEXT_TO_BBOX_SINGLE_BASES = (
    "Where does the text {} appear?",
    "Locate the text {} in the image.",
    "Find the bounding box that contains the text {}.",
    "Where is the text {} in the image?",
    "Give the location of text {}.",
)

OCR_TEXT_TO_BBOX_MULTI_BASES = (
    "List all bounding boxes that contain the text {}.",
    "For the text {}, give every bounding box for it.",
    "Where does {} appear? List all locations as bounding boxes.",
    "Find every occurrence of {} and give each bounding box.",
)
