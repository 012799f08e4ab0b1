"""i18n string tables for the realtime GUI.

Capability parity with /root/reference/gui_locale.py: language tables with an
inheritance chain (missing keys fall back along the chain), auto-detection
from the system locale via `I18nAuto`.
"""
import locale

LANGUAGE_LIST = ["zh_CN", "en_US", "ja_JP"]

LANGUAGE_ALL = {
    "en_US": {
        "SUPER": None,
        "LANGUAGE": "en_US",
        "Select model file": "Select model file",
        "Input device": "Input device",
        "Output device": "Output device",
        "Speaker ID": "Speaker ID",
        "Response threshold": "Response threshold",
        "Pitch shift (semitones)": "Pitch shift (semitones)",
        "Sample rate": "Sample rate",
        "Block time (s)": "Block time (s)",
        "Crossfade time (s)": "Crossfade time (s)",
        "Buffer count": "Buffer count",
        "Pitch extractor": "Pitch extractor",
        "Use enhancer": "Use enhancer",
        "Use phase vocoder": "Use phase vocoder",
        "Speaker mix": "Speaker mix",
        "Start conversion": "Start conversion",
        "Stop conversion": "Stop conversion",
        "Inference time (ms)": "Inference time (ms)",
    },
    "zh_CN": {
        "SUPER": "en_US",
        "LANGUAGE": "zh_CN",
        "Select model file": "选择模型文件",
        "Input device": "输入设备",
        "Output device": "输出设备",
        "Speaker ID": "说话人ID",
        "Response threshold": "响应阈值",
        "Pitch shift (semitones)": "变调(半音)",
        "Sample rate": "采样率",
        "Block time (s)": "块时长(秒)",
        "Crossfade time (s)": "交叉淡化时长(秒)",
        "Buffer count": "缓冲数量",
        "Pitch extractor": "音高提取器",
        "Use enhancer": "使用增强器",
        "Use phase vocoder": "使用相位声码器",
        "Speaker mix": "说话人混合",
        "Start conversion": "开始转换",
        "Stop conversion": "停止转换",
        "Inference time (ms)": "推理时间(毫秒)",
    },
    "ja_JP": {
        "SUPER": "en_US",
        "LANGUAGE": "ja_JP",
        "Select model file": "モデルファイルを選択",
        "Input device": "入力デバイス",
        "Output device": "出力デバイス",
        "Speaker ID": "話者ID",
        "Response threshold": "応答しきい値",
        "Pitch shift (semitones)": "ピッチシフト(半音)",
        "Sample rate": "サンプリングレート",
        "Block time (s)": "ブロック時間(秒)",
        "Crossfade time (s)": "クロスフェード時間(秒)",
        "Buffer count": "バッファ数",
        "Pitch extractor": "ピッチ抽出器",
        "Use enhancer": "エンハンサーを使用",
        "Use phase vocoder": "フェーズボコーダーを使用",
        "Speaker mix": "話者ミックス",
        "Start conversion": "変換開始",
        "Stop conversion": "変換停止",
        "Inference time (ms)": "推論時間(ミリ秒)",
    },
}


class I18nAuto:
    def __init__(self, language=None):
        if language is None:
            language = "auto"
        if language == "auto":
            language = locale.getdefaultlocale()[0] or "en_US"
        if language not in LANGUAGE_LIST:
            language = "en_US"
        self.language = language
        self.language_map = {}
        # resolve the inheritance chain, base first
        chain = []
        lang = language
        while lang is not None:
            chain.append(lang)
            lang = LANGUAGE_ALL[lang]["SUPER"]
        for lang in reversed(chain):
            self.language_map.update(LANGUAGE_ALL[lang])

    def __call__(self, key: str) -> str:
        return self.language_map.get(key, key)
