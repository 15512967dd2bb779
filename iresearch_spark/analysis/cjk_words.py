"""Compact built-in CJK word list for dictionary segmentation.

The reference's `segmentation` analyzer breaks unspaced CJK scripts
with ICU's dictionary-based break iterator
(`core/analysis/segmentation_token_stream.cpp`; ICU ships frequency
dictionaries for zh/ja/th). This is the same mechanism at sandbox
scale: a few hundred high-frequency multi-character words used by the
longest-match segmenter in analyzers._make_cjk_tokenize; callers with
a real lexicon pass it via the analyzer's `cjk_dict=` option, which
REPLACES this list (it never merges, so behavior is exactly the
caller's dictionary).
"""

from __future__ import annotations

# simplified + traditional Chinese and Japanese kanji compounds;
# multi-character words only (single chars are the fallback)
CJK_WORDS: frozenset[str] = frozenset(
    """
中国 中文 北京 上海 台湾 香港 美国 英国 日本 德国 法国 俄罗斯 韩国
大学 学生 学习 学校 老师 教育 教授 研究 科学 技术 工程 数学 物理
工作 时间 问题 我们 你们 他们 她们 自己 大家 今天 明天 昨天 现在
什么 怎么 为什么 可以 知道 没有 一个 这个 那个 这些 那些 因为 所以
如果 但是 虽然 已经 还是 或者 而且 然后 开始 结束 需要 可能 应该
国家 政府 经济 发展 社会 文化 历史 世界 政治 法律 军事 外交 人民
互联网 计算机 电脑 手机 软件 硬件 数据 信息 系统 网络 服务 网站
公司 市场 产品 管理 企业 银行 金融 投资 贸易 工业 农业 商业 价格
孩子 朋友 家庭 父母 医生 医院 健康 生活 音乐 电影 新闻 报道 记者
城市 农村 环境 污染 能源 汽车 火车 飞机 机场 车站 地铁 交通 旅游
东京 大阪 京都 日本语 会社 仕事 时间 问题 电话 电视 电影院 图书馆
東京 大阪 京都 日本語 会社 仕事 時間 問題 電話 電車 飛行機 新聞
学生 学校 先生 大学院 研究所 経済 政府 世界 情報 技術 開発 研究
映画 音楽 友達 家族 病院 健康 生活 料理 野球 銀行 会議 社員
""".split()
)
