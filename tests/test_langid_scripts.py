"""Script-gate language ID (functions/langid.py _script_gate): languages
whose writing system is unique among the supported set — zh/ar/ko/hi/el/
he/th — plus the Han-script ja/zh kana split.  The centroid model has
never seen these codepoints, so the gate is what makes the predictions
sound at all; Latin/Cyrillic docs must be untouched by it."""

from __future__ import annotations

from deidentify_spark.functions.langid import predict_batch

# Authored sentences (not from any training pool — the gate has no
# training), long enough to be unambiguous web-page-like content.
SAMPLES = {
    "zh": "机器学习模型需要大量高质量的训练数据，研究人员正在开发新的数据清洗方法来提高语料库的质量。",
    "ja": "機械学習モデルには大量の高品質な学習データが必要であり、研究者たちはコーパスの品質を高める新しい手法を開発しています。",
    "ko": "기계 학습 모델에는 대량의 고품질 학습 데이터가 필요하며 연구자들은 말뭉치 품질을 높이는 새로운 방법을 개발하고 있습니다.",
    "ar": "تتطلب نماذج التعلم الآلي كميات كبيرة من بيانات التدريب عالية الجودة ويطور الباحثون طرقا جديدة لتحسين جودة المدونات النصية.",
    "hi": "मशीन लर्निंग मॉडल को बड़ी मात्रा में उच्च गुणवत्ता वाले प्रशिक्षण डेटा की आवश्यकता होती है और शोधकर्ता नई विधियाँ विकसित कर रहे हैं।",
    "el": "Τα μοντέλα μηχανικής μάθησης χρειάζονται μεγάλες ποσότητες εκπαιδευτικών δεδομένων υψηλής ποιότητας και οι ερευνητές αναπτύσσουν νέες μεθόδους.",
    "he": "מודלים של למידת מכונה זקוקים לכמויות גדולות של נתוני אימון באיכות גבוהה והחוקרים מפתחים שיטות חדשות לשיפור איכות הקורפוס.",
    "th": "โมเดลการเรียนรู้ของเครื่องต้องการข้อมูลฝึกอบรมคุณภาพสูงจำนวนมากและนักวิจัยกำลังพัฒนาวิธีการใหม่เพื่อปรับปรุงคุณภาพของคลังข้อความ",
}


def test_script_languages_predicted():
    texts = list(SAMPLES.values())
    preds, confs = predict_batch(texts)
    got = dict(zip(SAMPLES.keys(), preds))
    assert got == {k: k for k in SAMPLES}, got
    # gate confidence is the script fraction — must clear the pipeline's
    # 0.35 lang_conf gate with room
    assert all(c > 0.5 for c in confs), confs


def test_ja_zh_kana_split():
    # kanji-only string (a zh sentence) must NOT become ja, and a
    # kana-heavy string must not become zh
    zh_only_han = "今天天气很好我们去公园散步然后喝茶聊天非常愉快"
    ja_kana = "これはとてもたのしいです。ひらがなだけのぶんしょうです。"
    preds, _ = predict_batch([zh_only_han, ja_kana])
    assert preds == ["zh", "ja"]


def test_mixed_latin_majority_falls_through_to_model():
    # a mostly-English doc with a quoted zh phrase stays with the model
    text = (
        "The quick brown fox jumps over the lazy dog near the river bank "
        "and the children watch it every single morning before school "
        'while the sign reads 你好 in bright red letters.'
    )
    preds, _ = predict_batch([text])
    assert preds == ["en"]


def test_latin_and_cyrillic_paths_unchanged():
    # docs with zero script-gate codepoints take the exact old path
    texts = [
        "The weather report said it would rain all afternoon in the valley.",
        "Le rapport météo annonçait de la pluie pour tout l'après-midi.",
        "Прогноз погоды обещал дождь на всю вторую половину дня в долине.",
    ]
    preds, confs = predict_batch(texts)
    assert preds == ["en", "fr", "ru"]
    assert all(c > 0.0 for c in confs)


def test_generator_blast_radius_zero():
    """No generated doc (none uses a gate script except ja, whose argmax
    must not move) changes prediction class vs the labels."""
    from deidentify_spark.functions.quality import QualityConfig
    from deidentify_spark.sources.pages import make_doc

    cfg = QualityConfig()
    docs = [make_doc(42, i, cfg) for i in range(1500)]
    preds, _ = predict_batch([d["text"] for d in docs])
    ja_docs = [i for i, d in enumerate(docs) if d["true_lang"] == "ja"]
    assert ja_docs, "expected ja docs in the slice"
    assert all(preds[i] == "ja" for i in ja_docs)
