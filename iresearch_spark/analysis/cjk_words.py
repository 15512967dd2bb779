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

# High-frequency Thai words for the same longest-match segmenter
# (ICU's th dictionary break analogue; segmentation_token_stream.cpp).
# Multi-character words only — unmatched Thai text falls back to ONE
# span token per unmatched stretch (never per character: a bare
# combining vowel/tone mark is not a token). Replaced wholesale by
# the analyzer's `cjk_dict=` option, same as CJK_WORDS.
THAI_WORDS: frozenset[str] = frozenset(
    """
ที่ และ ของ ใน เป็น ได้ ให้ ไม่ มี จะ ว่า มา ไป กับ แต่ หรือ ก็ ถ้า
เมื่อ จาก โดย ต้อง ถูก แล้ว ยัง อยู่ อย่าง เพราะ เพื่อ กว่า ตาม ด้วย
นี้ นั้น ซึ่ง คือ ทั้ง ต่อ จึง เคย ควร อาจ กำลัง ทุก บาง หลาย อีก เอง
ขึ้น ลง ออก เข้า ฉัน ผม คุณ เขา เธอ เรา มัน ท่าน พวก
คน น้ำ บ้าน เมือง ประเทศ ไทย กรุงเทพ โรงเรียน มหาวิทยาลัย นักเรียน
นักศึกษา ครู หมอ โรงพยาบาล รถ รถยนต์ รถไฟ เครื่องบิน ถนน ตลาด ร้าน
อาหาร ข้าว ผลไม้ หนังสือ ภาษา คำ เรื่อง เวลา วัน เดือน ปี วันนี้
พรุ่งนี้ เช้า เย็น คืน ครอบครัว พ่อ แม่ ลูก พี่ น้อง เพื่อน งาน เงิน
บาท รัฐบาล การเมือง เศรษฐกิจ สังคม วัฒนธรรม โลก ข่าว เพลง กีฬา
ฟุตบอล สุขภาพ ทะเล ภูเขา แม่น้ำ ต้นไม้ สัตว์ หมา แมว ช้าง ใจ มือ ตา
หัว บริษัท ธนาคาร ตำรวจ ทหาร วัด พระ รูป สี เสียง ไฟ ลม ฝน ฟ้า ดิน
ทอง เหล็ก ไม้ กระดาษ โต๊ะ เก้าอี้ ประตู หน้าต่าง ห้อง ครัว สวน เด็ก
ผู้หญิง ผู้ชาย
กิน ดื่ม นอน เดิน วิ่ง พูด บอก ถาม ตอบ อ่าน เขียน เรียน สอน ทำ
ทำงาน เล่น ดู ฟัง ซื้อ ขาย ใช้ ช่วย รัก ชอบ คิด รู้ เห็น หา พบ เจอ
เปิด ปิด เริ่ม หยุด รอ ส่ง รับ นั่ง ยืน ขับ บิน ร้อง ยิ้ม จ่าย เก็บ
สร้าง แก้ เปลี่ยน เลือก ลอง
ดี ใหม่ เก่า ใหญ่ เล็ก สูง ยาว สั้น ร้อน เย็น เร็ว ช้า สวย มาก น้อย
แพง ง่าย ยาก สำคัญ สนุก อร่อย หนัก เบา ขาว ดำ แดง เขียว เหลือง
หนึ่ง สอง สาม สี่ ห้า หก เจ็ด แปด เก้า สิบ ร้อย พัน หมื่น แสน ล้าน
สวัสดี ขอบคุณ ภาษาไทย คนไทย อาหารไทย ประเทศไทย
""".split()
)

# High-frequency HIRAGANA function words for the kana branch of the
# same segmenter (ICU's ja dictionary break consults a lexicon over
# kana runs too). Particles, copula/auxiliary forms, demonstratives,
# pronouns, question words, conjunctions/adverbs, and the handful of
# content words conventionally written in kana. A hiragana run splits
# ONLY when it is entirely composed of these words (full-cover
# segmentation — see analyzers._make_cjk_tokenize); any run the list
# cannot fully cover stays ONE token, so a sparse lexicon can never
# shred an unknown word. Replaced wholesale by `cjk_dict=`.
KANA_WORDS: frozenset[str] = frozenset(
    """
の は を に が と で も へ や か ね よ から まで より など だけ
ほど しか ばかり こそ さえ でも とか って
です ます でした ました でしょう ましょう ません だ だった である
ない なかった たい なら ので のに けど けれど けれども
する した して しない います いる いた いない ある あります
ありません あった なる なった なります できる できた できます
わかる わかった わかります ください
これ それ あれ どれ ここ そこ あそこ どこ この その あの どの
こう そう ああ どう こちら そちら あちら どちら
わたし ぼく きみ あなた だれ なに なん いつ なぜ どうして みんな
そして しかし また まだ もう とても すごく よく すこし ちょっと
たくさん ぜんぶ いつも ときどき たぶん もちろん やはり やっぱり
だから それで つまり ところで さらに すぐ ずっと ほとんど
こと もの ところ とき ひと ため よう ほう うち まえ あと なか
こんにちは ありがとう さようなら おはよう すみません ございます
""".split()
)
