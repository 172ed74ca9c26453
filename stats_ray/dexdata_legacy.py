"""Hand-authored real-data dex slice for reference-fixture parity.

Covers every species / item / ability / move appearing in the reference's
checked-in test logs (stats/src/test/testdata/logs/*) so the engine can
parse those real battle logs and reproduce the reference's golden reports
byte-for-byte (integration.ts:29-103).

All data here is public knowledge (Pokémon base stats, types and display
names as used by Pokémon Showdown's gen-9 dex). The reference's *legacy*
mode resolves every dex lookup against the default gen-9 data
(util.ts:33-38 ignoreGen), so one gen-9 slice serves all formats; the
classifier uses the legacy hardcoded move tables (classifier.ts:518-741
export consts — semantic constants, replicated as data).
"""

from __future__ import annotations

from .dex import NATURES
from .gendex import GenDex, register, to_id

# ---------------------------------------------------------------------------
# Species. (name, types, hp, atk, def, spa, spd, spe[, baseSpecies, forme,
# ability0]) — gen-9 data.

_S = [
    # gen1ou
    ("Alakazam", ("Psychic",), 55, 50, 45, 135, 95, 120),
    ("Clefable", ("Fairy",), 95, 70, 73, 95, 90, 60),
    ("Dragonite", ("Dragon", "Flying"), 91, 134, 95, 100, 100, 80),
    ("Exeggutor", ("Grass", "Psychic"), 95, 95, 85, 125, 75, 55),
    ("Jolteon", ("Electric",), 65, 65, 60, 110, 95, 130),
    ("Nidoqueen", ("Poison", "Ground"), 90, 92, 87, 75, 85, 76),
    ("Snorlax", ("Normal",), 160, 110, 65, 65, 110, 30),
    ("Starmie", ("Water", "Psychic"), 60, 75, 85, 100, 85, 115),
    ("Tauros", ("Normal",), 75, 100, 95, 40, 70, 110),
    # gen6doublesou
    ("Aegislash", ("Steel", "Ghost"), 60, 50, 140, 50, 140, 60),
    ("Aegislash-Blade", ("Steel", "Ghost"), 60, 140, 50, 140, 50, 60,
     "aegislash", "Blade"),
    ("Amoonguss", ("Grass", "Poison"), 114, 85, 70, 85, 80, 30),
    ("Camerupt", ("Fire", "Ground"), 70, 100, 70, 105, 75, 40),
    ("Camerupt-Mega", ("Fire", "Ground"), 70, 120, 100, 145, 105, 20,
     "camerupt", "Mega", "sheerforce"),
    ("Charizard", ("Fire", "Flying"), 78, 84, 78, 109, 85, 100),
    ("Charizard-Mega-X", ("Fire", "Dragon"), 78, 130, 111, 130, 85, 100,
     "charizard", "Mega-X", "toughclaws"),
    ("Charizard-Mega-Y", ("Fire", "Flying"), 78, 104, 78, 159, 115, 100,
     "charizard", "Mega-Y", "drought"),
    ("Cresselia", ("Psychic",), 120, 70, 110, 75, 120, 85),
    ("Diancie", ("Rock", "Fairy"), 50, 100, 150, 100, 150, 50),
    ("Keldeo-Resolute", ("Water", "Fighting"), 91, 72, 90, 129, 90, 108,
     "keldeo", "Resolute"),
    ("Keldeo", ("Water", "Fighting"), 91, 72, 90, 129, 90, 108),
    ("Kyurem-Black", ("Dragon", "Ice"), 125, 170, 100, 120, 90, 95,
     "kyurem", "Black"),
    ("Kyurem", ("Dragon", "Ice"), 125, 130, 90, 130, 90, 95),
    ("Rhyperior", ("Ground", "Rock"), 115, 140, 130, 55, 55, 40),
    ("Rotom-Wash", ("Electric", "Water"), 50, 65, 107, 105, 107, 86,
     "rotom", "Wash"),
    ("Rotom", ("Electric", "Ghost"), 50, 50, 77, 95, 77, 91),
    ("Scrafty", ("Dark", "Fighting"), 65, 90, 115, 45, 115, 58),
    # gen7anythinggoes / gen7ubers
    ("Darmanitan", ("Fire",), 105, 140, 55, 30, 55, 95),
    ("Darmanitan-Zen", ("Fire", "Psychic"), 105, 30, 105, 140, 105, 55,
     "darmanitan", "Zen"),
    ("Ditto", ("Normal",), 48, 48, 48, 48, 48, 48),
    ("Dugtrio", ("Ground",), 35, 100, 50, 50, 70, 120),
    ("Gastrodon", ("Water", "Ground"), 111, 83, 68, 92, 82, 39),
    ("Gastrodon-East", ("Water", "Ground"), 111, 83, 68, 92, 82, 39,
     "gastrodon", "East"),
    ("Greninja", ("Water", "Dark"), 72, 95, 67, 103, 71, 122),
    ("Greninja-Ash", ("Water", "Dark"), 72, 145, 67, 153, 71, 132,
     "greninja", "Ash"),
    ("Mimikyu", ("Ghost", "Fairy"), 55, 90, 80, 50, 105, 96),
    ("Mimikyu-Busted", ("Ghost", "Fairy"), 55, 90, 80, 50, 105, 96,
     "mimikyu", "Busted"),
    ("Rayquaza", ("Dragon", "Flying"), 105, 150, 90, 150, 90, 95),
    ("Rayquaza-Mega", ("Dragon", "Flying"), 105, 180, 100, 180, 100, 115,
     "rayquaza", "Mega", "deltastream"),
    ("Shaymin", ("Grass",), 100, 100, 100, 100, 100, 100),
    ("Shaymin-Sky", ("Grass", "Flying"), 100, 103, 75, 120, 75, 127,
     "shaymin", "Sky"),
    ("Zygarde", ("Dragon", "Ground"), 108, 100, 121, 81, 95, 95),
    ("Zygarde-Complete", ("Dragon", "Ground"), 216, 100, 121, 91, 95, 85,
     "zygarde", "Complete"),
    ("Genesect", ("Bug", "Steel"), 71, 120, 95, 120, 95, 99),
    ("Genesect-Burn", ("Bug", "Steel"), 71, 120, 95, 120, 95, 99,
     "genesect", "Burn"),
    ("Kyogre", ("Water",), 100, 100, 90, 150, 140, 90),
    ("Kyogre-Primal", ("Water",), 100, 150, 90, 180, 160, 90,
     "kyogre", "Primal", "primordialsea"),
    ("Groudon", ("Ground",), 100, 150, 140, 100, 90, 90),
    ("Groudon-Primal", ("Ground", "Fire"), 100, 180, 160, 150, 90, 90,
     "groudon", "Primal", "desolateland"),
    ("Ludicolo", ("Water", "Grass"), 80, 70, 70, 90, 100, 70),
    ("Lycanroc-Dusk", ("Rock",), 75, 117, 65, 55, 65, 110,
     "lycanroc", "Dusk"),
    ("Lycanroc", ("Rock",), 75, 115, 65, 55, 65, 112),
    ("Magnezone", ("Electric", "Steel"), 70, 70, 115, 130, 90, 60),
    ("Meloetta", ("Normal", "Psychic"), 100, 77, 77, 128, 128, 90),
    ("Meloetta-Pirouette", ("Normal", "Fighting"), 100, 128, 90, 77, 77, 128,
     "meloetta", "Pirouette"),
    ("Metagross", ("Steel", "Psychic"), 80, 135, 130, 95, 90, 70),
    ("Metagross-Mega", ("Steel", "Psychic"), 80, 145, 150, 105, 110, 110,
     "metagross", "Mega", "toughclaws"),
    ("Necrozma-Dusk-Mane", ("Psychic", "Steel"), 97, 157, 127, 113, 109, 77,
     "necrozma", "Dusk-Mane"),
    ("Necrozma", ("Psychic",), 97, 107, 101, 127, 89, 79),
    ("Pelipper", ("Water", "Flying"), 60, 50, 100, 95, 70, 65),
    ("Shedinja", ("Bug", "Ghost"), 1, 90, 45, 30, 30, 40),
    ("Swampert", ("Water", "Ground"), 100, 110, 90, 85, 90, 60),
    ("Swampert-Mega", ("Water", "Ground"), 100, 150, 110, 95, 110, 70,
     "swampert", "Mega", "swiftswim"),
    ("Tentacruel", ("Water", "Poison"), 80, 70, 65, 80, 120, 100),
    ("Zoroark", ("Dark",), 60, 105, 60, 120, 60, 105),
    ("Nidoran-M", ("Poison",), 46, 57, 40, 40, 40, 50),
    # gen7challengecup1v1
    ("Arceus", ("Normal",), 120, 120, 120, 120, 120, 120),
    ("Bagon", ("Dragon",), 45, 75, 60, 40, 30, 50),
    ("Bayleef", ("Grass",), 60, 62, 80, 63, 80, 60),
    ("Beedrill", ("Bug", "Poison"), 65, 90, 40, 45, 80, 75),
    ("Carnivine", ("Grass",), 74, 100, 72, 90, 72, 46),
    ("Carracosta", ("Water", "Rock"), 74, 108, 133, 83, 65, 32),
    ("Castform", ("Normal",), 70, 70, 70, 70, 70, 70),
    ("Chikorita", ("Grass",), 45, 49, 65, 49, 65, 45),
    ("Cloyster", ("Water", "Ice"), 50, 95, 180, 85, 45, 70),
    ("Combusken", ("Fire", "Fighting"), 60, 85, 60, 85, 60, 55),
    ("Cosmog", ("Psychic",), 43, 29, 31, 29, 31, 37),
    ("Deino", ("Dark", "Dragon"), 52, 65, 50, 45, 50, 38),
    ("Eevee", ("Normal",), 55, 55, 50, 45, 65, 55),
    ("Electabuzz", ("Electric",), 65, 83, 57, 95, 85, 105),
    ("Florges", ("Fairy",), 78, 65, 68, 112, 154, 75),
    ("Furret", ("Normal",), 85, 76, 64, 45, 55, 90),
    ("Gastly", ("Ghost", "Poison"), 30, 35, 30, 100, 35, 80),
    ("Heliolisk", ("Electric", "Normal"), 62, 55, 52, 109, 94, 109),
    ("Hitmonlee", ("Fighting",), 50, 120, 53, 35, 110, 87),
    ("Honchkrow", ("Dark", "Flying"), 100, 125, 52, 105, 52, 71),
    ("Honedge", ("Steel", "Ghost"), 45, 80, 100, 35, 37, 28),
    ("Kartana", ("Grass", "Steel"), 59, 181, 131, 59, 31, 109),
    ("Kingler", ("Water",), 55, 130, 115, 50, 50, 75),
    ("Koffing", ("Poison",), 40, 65, 95, 60, 45, 35),
    ("Kricketot", ("Bug",), 37, 25, 41, 25, 41, 25),
    ("Lanturn", ("Water", "Electric"), 125, 58, 58, 76, 76, 67),
    ("Latios", ("Dragon", "Psychic"), 80, 90, 80, 130, 110, 110),
    ("Lilligant", ("Grass",), 70, 60, 75, 110, 75, 90),
    ("Linoone", ("Normal",), 78, 70, 61, 50, 61, 100),
    ("Loudred", ("Normal",), 84, 71, 43, 71, 43, 48),
    ("Machop", ("Fighting",), 70, 80, 50, 35, 35, 35),
    ("Magcargo", ("Fire", "Rock"), 60, 50, 120, 90, 80, 30),
    ("Magikarp", ("Water",), 20, 10, 55, 15, 20, 80),
    ("Misdreavus", ("Ghost",), 60, 60, 60, 85, 85, 85),
    ("Naganadel", ("Poison", "Dragon"), 73, 73, 73, 127, 73, 121),
    ("Nidorino", ("Poison",), 61, 72, 57, 55, 55, 65),
    ("Pangoro", ("Fighting", "Dark"), 95, 124, 78, 69, 71, 58),
    ("Pyukumuku", ("Water",), 55, 60, 130, 30, 130, 5),
    ("Raichu-Alola", ("Electric", "Psychic"), 60, 85, 50, 95, 85, 110,
     "raichu", "Alola"),
    ("Raichu", ("Electric",), 60, 90, 55, 90, 80, 110),
    ("Ribombee", ("Bug", "Fairy"), 60, 55, 60, 95, 70, 124),
    ("Salamence", ("Dragon", "Flying"), 95, 135, 80, 110, 80, 100),
    ("Scolipede", ("Bug", "Poison"), 60, 100, 89, 55, 69, 112),
    ("Seadra", ("Water",), 55, 65, 95, 95, 45, 85),
    ("Shelgon", ("Dragon",), 65, 95, 100, 60, 50, 50),
    ("Suicune", ("Water",), 100, 75, 115, 90, 115, 85),
    ("Swanna", ("Water", "Flying"), 75, 87, 63, 87, 63, 98),
    ("Swoobat", ("Psychic", "Flying"), 67, 57, 55, 77, 55, 114),
    ("Taillow", ("Normal", "Flying"), 40, 55, 30, 30, 30, 85),
    ("Togepi", ("Fairy",), 35, 20, 65, 40, 65, 20),
    ("Unown", ("Psychic",), 48, 72, 48, 72, 48, 48),
    ("Whismur", ("Normal",), 64, 51, 23, 51, 23, 28),
    ("Wimpod", ("Bug", "Water"), 25, 35, 40, 20, 30, 80),
    ("Wishiwashi", ("Water",), 45, 20, 20, 25, 25, 40),
    ("Wooper", ("Water", "Ground"), 55, 45, 45, 25, 25, 15),
    # gen9ubers
    ("Kingambit", ("Dark", "Steel"), 100, 135, 120, 60, 85, 50),
    ("Ogerpon", ("Grass",), 80, 120, 84, 60, 96, 110),
    ("Ogerpon-Cornerstone", ("Grass", "Rock"), 80, 120, 84, 60, 96, 110,
     "ogerpon", "Cornerstone"),
    ("Ogerpon-Hearthflame", ("Grass", "Fire"), 80, 120, 84, 60, 96, 110,
     "ogerpon", "Hearthflame"),
    ("Ogerpon-Wellspring", ("Grass", "Water"), 80, 120, 84, 60, 96, 110,
     "ogerpon", "Wellspring"),
    ("Palafin", ("Water",), 100, 70, 72, 53, 62, 100),
    ("Palafin-Hero", ("Water",), 100, 160, 97, 106, 87, 100,
     "palafin", "Hero"),
    ("Terapagos", ("Normal",), 90, 65, 85, 65, 85, 60),
]

SPECIES: dict[str, dict] = {}
for row in _S:
    name, types = row[0], row[1]
    hp, atk, df, spa, spd, spe = row[2:8]
    base = row[8] if len(row) > 8 else None
    forme = row[9] if len(row) > 9 else ""
    a0 = row[10] if len(row) > 10 else None
    rec = {
        "name": name, "types": types,
        "baseStats": {"hp": hp, "atk": atk, "def": df,
                      "spa": spa, "spd": spd, "spe": spe},
        "baseSpecies": base, "forme": forme,
    }
    if a0:
        rec["ability0"] = a0
    SPECIES[to_id(name)] = rec

# forme-undo set for protocol identification (parser.ts:337-342, verbatim ids)
FORMES: set[str] = {
    "greninjaash", "zygardecomplete", "mimikyubusted", "mimikyubustedtotem",
    "shayminsky", "necrozmaultra", "zaciancrowned", "zamazentacrowned",
    "palafinhero", "ogerpontealtera", "ogerponhearthflametera",
    "ogerponwellspringtera", "ogerponcornerstonetera", "terapagosterastal",
    "terapagosstellar",
}

# ---------------------------------------------------------------------------
# Items.

_ITEM_NAMES = [
    "Absolite", "Absorb Bulb", "Air Balloon", "Apicot Berry", "Aspear Berry",
    "Assault Vest", "Banettite", "Berry Juice", "Big Root", "Black Sludge",
    "Blastoisinite", "Blue Orb", "Bottle Cap", "Bug Memory", "Burn Drive",
    "Cameruptite", "Charizardite X", "Charizardite Y", "Cherish Ball",
    "Chesto Berry", "Chill Drive", "Choice Band", "Choice Scarf",
    "Choice Specs", "Coba Berry", "Cornerstone Mask", "Cover Fossil",
    "Dubious Disc", "Eject Button", "Eviolite", "Fairium Z",
    "Fire Stone", "Focus Sash", "Gengarite", "Gold Bottle Cap", "Grassy Seed",
    "Gyaradosite", "Hard Stone", "Hearthflame Mask", "Heavy Ball",
    "Heavy-Duty Boots", "Iapapa Berry", "Iron Ball", "Leaf Stone",
    "Leftovers", "Level Ball", "Life Orb", "Luminous Moss", "Magnet",
    "Metagrossite", "Metal Powder", "Mewtwonite Y", "Mind Plate", "Moon Ball",
    "Moon Stone", "Net Ball", "Normalium Z", "Persim Berry", "Pikanium Z",
    "Plume Fossil", "Power Band", "Power Weight", "Psychium Z", "Quick Claw",
    "Red Card", "Red Orb", "Rocky Helmet", "Safari Ball", "Safety Goggles",
    "Smooth Rock", "Starf Berry", "Steel Gem", "Swampertite",
    "Terrain Extender", "Toxic Orb", "Flame Orb", "Tyranitarite",
    "Ultranecrozium Z", "Waterium Z", "Weakness Policy", "Wellspring Mask",
    "Yache Berry", "Zap Plate", "Damp Rock", "Heat Rock", "Icy Rock",
]
ITEMS: dict[str, str] = {to_id(n): n for n in _ITEM_NAMES}

# item id -> (holder species id, mega species id, mega ability0)
MEGA_STONES = {
    "cameruptite": ("camerupt", "cameruptmega", "sheerforce"),
    "charizarditex": ("charizard", "charizardmegax", "toughclaws"),
    "charizarditey": ("charizard", "charizardmegay", "drought"),
    "metagrossite": ("metagross", "metagrossmega", "toughclaws"),
    "swampertite": ("swampert", "swampertmega", "swiftswim"),
}

# ---------------------------------------------------------------------------
# Abilities.

_ABILITY_NAMES = [
    "Air Lock", "Arena Trap", "Aura Break", "Battle Bond", "Beast Boost",
    "Big Pecks", "Blaze", "Clear Body", "Defiant", "Disguise", "Download",
    "Drizzle", "Drought", "Desolate Land", "Forecast", "Gluttony",
    "Honey Gather", "Hustle", "Hyper Cutter", "Illuminate", "Illusion",
    "Imposter", "Inner Focus", "Insomnia", "Intimidate", "Iron Fist",
    "Justified", "Leaf Guard", "Levitate", "Lightning Rod", "Limber",
    "Liquid Ooze", "Magma Armor", "Magnet Pull", "Mold Breaker", "Multitype",
    "Natural Cure", "No Guard", "Overgrow", "Own Tempo", "Poison Point",
    "Power Construct", "Primordial Sea", "Prism Armor", "Protean",
    "Rain Dish", "Rattled", "Reckless", "Regenerator", "Rivalry",
    "Rock Head", "Run Away", "Sand Veil", "Schooling", "Scrappy",
    "Serene Grace", "Sheer Force", "Shell Armor", "Skill Link", "Solid Rock",
    "Soundproof", "Speed Boost", "Stance Change", "Sticky Hold",
    "Storm Drain", "Sturdy", "Super Luck", "Supreme Overlord",
    "Surge Surfer", "Swarm", "Swift Swim", "Symbiosis", "Tera Shift",
    "Teravolt", "Torrent", "Tough Claws", "Unaware", "Vital Spirit",
    "Volt Absorb", "Water Absorb", "Wimp Out", "Wonder Guard", "Zen Mode",
    "Zero to Hero", "Delta Stream", "Sand Stream", "Snow Warning",
    "Shadow Tag", "Harvest", "Magic Bounce", "Klutz", "Guts", "Poison Heal",
]
ABILITIES: dict[str, str] = {to_id(n): n for n in _ABILITY_NAMES}

# ---------------------------------------------------------------------------
# Moves.

_MOVE_NAMES = [
    "Accelerock", "Acid Spray", "Acrobatics", "Aerial Ace", "Agility",
    "Air Slash", "Amnesia", "Ancient Power", "Aqua Jet", "Aqua Ring",
    "Astonish", "Attract", "Avalanche", "Bite", "Blizzard", "Body Slam",
    "Bounce", "Brick Break", "Brine", "Brutal Swing", "Bubble",
    "Bubble Beam", "Calm Mind", "Captivate", "Celebrate", "Clear Smog",
    "Close Combat", "Confide", "Counter", "Crunch", "Curse", "Cut",
    "Dark Pulse", "Dazzling Gleam", "Defense Curl", "Defog", "Destiny Bond",
    "Detect", "Diamond Storm", "Discharge", "Double-Edge", "Double Kick",
    "Double Team", "Draco Meteor", "Dragon Ascent", "Dragon Claw",
    "Dragon Dance", "Dragon Tail", "Drain Punch", "Dream Eater",
    "Drill Run", "Earth Power", "Earthquake", "Echoed Voice",
    "Electro Ball", "Electroweb", "Embargo", "Encore", "Energy Ball",
    "Explosion", "Extrasensory", "Extreme Speed", "Facade", "Fake Out",
    "False Swipe", "Fire Blast", "Fire Fang", "Flame Burst", "Flame Charge",
    "Flamethrower", "Flare Blitz", "Flash", "Flash Cannon", "Fling",
    "Flip Turn", "Focus Blast", "Focus Punch", "Foresight", "Frustration",
    "Fury Cutter", "Fusion Bolt", "Gastro Acid", "Giga Drain", "Giga Impact",
    "Glare", "Grass Knot", "Growl", "Hail", "Headbutt", "Head Smash",
    "Heat Wave", "Hex", "Hidden Power", "Horn Drill", "Howl", "Hurricane",
    "Hydro Pump", "Hyper Beam", "Hyper Voice", "Ice Beam", "Ice Punch",
    "Icy Wind", "Infestation", "Iron Defense", "Iron Head", "Iron Tail",
    "Ivy Cudgel", "Jet Punch", "King's Shield", "Knock Off", "Kowtow Cleave",
    "Laser Focus", "Last Resort", "Leer", "Liquidation", "Low Kick",
    "Magical Leaf", "Magic Coat", "Meditate", "Mega Kick", "Mimic",
    "Moonblast", "Moonlight", "Mud Shot", "Mud-Slap", "Mud Sport",
    "Natural Gift", "Nightmare", "Night Slash", "Odor Sleuth",
    "Origin Pulse", "Outrage", "Overheat", "Perish Song", "Petal Dance",
    "Photon Geyser", "Pin Missile", "Play Rough", "Poison Jab",
    "Power-Up Punch", "Protect", "Psychic", "Psycho Shift", "Psych Up",
    "Psyshock", "Pursuit", "Quash", "Quick Attack", "Quiver Dance", "Rage",
    "Rage Powder", "Rain Dance", "Rapid Spin", "Recover", "Reflect",
    "Relic Song", "Rest", "Return", "Roar", "Rock Blast", "Rock Polish",
    "Rock Slide", "Rock Smash", "Rock Throw", "Roost", "Round",
    "Sacred Sword", "Safeguard", "Scald", "Scary Face", "Secret Power",
    "Secret Sword", "Seed Bomb", "Seismic Toss", "Self-Destruct",
    "Shadow Ball", "Shadow Claw", "Shadow Sneak", "Shock Wave",
    "Signal Beam", "Sky Attack", "Slam", "Sleep Powder", "Sleep Talk",
    "Sludge Bomb", "Sludge Wave", "Smart Strike", "Snore", "Solar Beam",
    "Spikes", "Spiky Shield", "Splash", "Spore", "Stealth Rock",
    "Stone Edge", "String Shot", "Struggle Bug", "Stun Spore", "Submission",
    "Substitute", "Sucker Punch", "Sunny Day", "Super Fang", "Superpower",
    "Surf", "Swagger", "Swift", "Swords Dance", "Synthesis", "Tackle",
    "Tail Whip", "Tailwind", "Teeter Dance", "Teleport", "Tera Starstorm",
    "Thief", "Thousand Arrows", "Throat Chop", "Thunder", "Thunderbolt",
    "Thunder Punch", "Thunder Wave", "Tickle", "Torment", "Toxic",
    "Toxic Spikes", "Transform", "Trick", "Trick Room", "Uproar", "U-turn",
    "Volt Switch", "Waterfall", "Water Pulse", "Water Shuriken",
    "Wave Crash", "Whirlwind", "Wrap", "Zap Cannon", "Baton Pass",
    "Circle Throw",
]
MOVES: dict[str, str] = {to_id(n): n for n in _MOVE_NAMES}
for _t in ("Bug", "Dark", "Dragon", "Electric", "Fighting", "Fire", "Flying",
           "Ghost", "Grass", "Ground", "Ice", "Poison", "Psychic", "Rock",
           "Steel", "Water"):
    MOVES[f"hiddenpower{_t.lower()}"] = f"Hidden Power {_t}"

# ---------------------------------------------------------------------------
# Legacy classifier tables (classifier.ts:518-741 hardcoded export consts).

CLASSIFIER_TABLES: dict[str, set[str]] = {
    "greaterSetup": {
        "curse", "dragondance", "growth", "shiftgear", "swordsdance",
        "fierydance", "nastyplot", "tailglow", "quiverdance", "geomancy",
    },
    "lesserSetup": {
        "acupressure", "bulkup", "coil", "howl", "workup", "meditate",
        "sharpen", "calmmind", "chargebeam", "agility", "autotomize",
        "flamecharge", "rockpolish", "doubleteam", "minimize", "tailwind",
        "poweruppunch", "rototiller",
    },
    "batonPass": {
        "acupressure", "bellydrum", "bulkup", "coil", "curse", "dragondance",
        "growth", "honeclaws", "howl", "meditate", "sharpen", "shellsmash",
        "shiftgear", "swordsdance", "workup", "calmmind", "chargebeam",
        "fierydance", "nastyplot", "tailglow", "quiverdance", "agility",
        "autotomize", "flamecharge", "rockpolish", "doubleteam", "minimize",
        "substitute", "acidarmor", "barrier", "cosmicpower", "cottonguard",
        "defendorder", "defensecurl", "harden", "irondefense", "stockpile",
        "withdraw", "amnesia", "charge", "ingrain",
    },
    "gravity": {
        "guillotine", "fissure", "sheercold", "dynamicpunch", "inferno",
        "zapcannon", "grasswhistle", "sing", "supersonic", "hypnosis",
        "blizzard", "focusblast", "gunkshot", "hurricane", "smog", "thunder",
        "clamp", "dragonrush", "eggbomb", "irontail", "lovelykiss",
        "magmastorm", "megakick", "poisonpowder", "slam", "sleeppowder",
        "stunspore", "sweetkiss", "willowisp", "crosschop", "darkvoid",
        "furyswipes", "headsmash", "hydropump", "kinesis", "psywave",
        "rocktomb", "stoneedge", "submission", "boneclub", "bonerush",
        "bonemerang", "bulldoze", "dig", "drillrun", "earthpower",
        "earthquake", "magnitude", "mudbomb", "mudshot", "mudslap",
        "sandattack", "spikes", "toxicspikes",
    },
    "recovery": {
        "recover", "slackoff", "healorder", "milkdrink", "roost",
        "moonlight", "morningsun", "synthesis", "wish", "aquaring", "rest",
        "softboiled", "swallow", "leechseed",
    },
    "protection": {"protect", "detect", "kingsshield", "matblock",
                   "spikyshield"},
    "phazing": {"whirlwind", "roar", "circlethrow", "dragontail"},
    "paralysis": {"thunderwave", "stunspore", "glare", "nuzzle"},
    "confusion": {"supersonic", "confuseray", "swagger", "flatter",
                  "teeterdance", "yawn"},
    "sleep": {"darkvoid", "grasswhistle", "hypnosis", "lovelykiss", "sing",
              "sleeppowder", "spore"},
    "ohko": {"guillotine", "fissure", "sheercold"},
    "greaterOffensive": {
        "selfdestruct", "explosion", "destinybond", "perishsong", "memento",
        "healingwish", "lunardance", "finalgambit",
    },
    "lesserOffensive": {
        "jumpkick", "doubleedge", "submission", "petaldance", "hijumpkick",
        "outrage", "volttackle", "closecombat", "flareblitz", "bravebird",
        "woodhammer", "headsmash", "headcharge", "wildcharge", "takedown",
        "dragonascent",
    },
}

# classifier.ts:395-443 (shared by legacy & computed paths)
GREATER_OFFENSIVE_ABILITIES = {"purepower", "hugepower", "speedboost",
                               "moody"}
LESSER_OFFENSIVE_ABILITIES = {
    "chlorophyll", "download", "hustle", "moxie", "reckless", "sandrush",
    "solarpower", "swiftswim", "technician", "tintedlens", "darkaura",
    "fairyaura", "infiltrator", "parentalbond", "protean", "strongjaw",
    "sweetveil", "toughclaws", "aerilate", "normalize", "pixilate",
    "refrigerate",
}
LESSER_DEFENSIVE_ABILITIES = {
    "dryskin", "filter", "hydration", "icebody", "intimidate", "ironbarbs",
    "marvelscale", "naturalcure", "magicguard", "multiscale", "raindish",
    "roughskin", "solidrock", "thickfat", "unaware", "aromaveil",
    "bulletproof", "cheekpouch", "gooey", "regenerator",
}
GREATER_DEFENSIVE_ABILITIES = {"slowstart", "truant", "furcoat", "harvest"}

LESSER_BOOSTING_ITEMS = {
    "expertbelt", "wiseglasses", "muscleband", "dracoplate", "dreadplate",
    "earthplate", "fistplate", "flameplate", "icicleplate", "insectplate",
    "ironplate", "meadowplate", "mindplate", "skyplate", "splashplate",
    "spookyplate", "stoneplate", "toxicplate", "zapplate", "blackglasses",
    "charcoal", "dragonfang", "hardstone", "magnet", "metalcoat",
    "miracleseed", "mysticwater", "nevermeltice", "poisonbarb", "sharpbeak",
    "silkscarf", "silverpowder", "softsand", "spelltag", "twistedspoon",
    "pixieplate",
}
GREATER_BOOSTING_ITEMS = {
    "firegem", "watergem", "electricgem", "grassgem", "icegem",
    "fightinggem", "poisongem", "groundgem", "flyinggem", "psychicgem",
    "buggem", "rockgem", "ghostgem", "darkgem", "steelgem", "normalgem",
    "focussash", "mentalherb", "powerherb", "whiteherb", "absorbbulb",
    "berserkgene", "cellbattery", "airballoon", "ejectbutton", "shedshell",
    "aguavberry", "apicotberry", "aspearberry", "babiriberry", "chartiberry",
    "cheriberry", "chestoberry", "chilanberry", "chopleberry", "cobaberry",
    "custapberry", "enigmaberry", "figyberry", "ganlonberry", "habanberry",
    "iapapaberry", "jabocaberry", "kasibberry", "kebiaberry", "lansatberry",
    "leppaberry", "liechiberry", "lumberry", "magoberry", "micleberry",
    "occaberry", "oranberry", "passhoberry", "payapaberry", "pechaberry",
    "persimberry", "petayaberry", "rawstberry", "rindoberry", "rowapberry",
    "salacberry", "shucaberry", "sitrusberry", "starfberry", "tangaberry",
    "wacanberry", "wikiberry", "yacheberry", "keeberry", "marangaberry",
    "roseliberry", "snowball", "choiceband", "choicescarf", "choicespecs",
    "lifeorb",
}

TRAPPING_ABILITIES = {"arenatrap", "magnetpull", "shadowtag"}
# classifyForme list (classifier.ts:111) vs tag() legacy list
# (classifier.ts:282)
TRAPPING_MOVES = {"block", "meanlook", "spiderweb", "pursuit"}
TAG_TRAPPING_MOVES = {"block", "meanlook", "spiderweb"}
SETUP_ABILITIES = {"angerpoint", "contrary", "moody", "moxie", "speedboost"}

DRAGONS = {
    "dratini", "dragonair", "bagon", "shelgon", "axew", "fraxure", "haxorus",
    "druddigon", "dragonite", "altaria", "salamence", "latias", "latios",
    "rayquaza", "gible", "gabite", "garchomp", "reshiram", "zekrom",
    "kyurem", "kyuremwhite", "kyuremblack", "kingdra", "vibrava", "flygon",
    "dialga", "palkia", "giratina", "giratinaorigin", "deino", "zweilous",
    "hydreigon",
}

# util.ts:101-139, 186-208 (legacy lists, verbatim)
NON_SINGLES_FORMATS_LEGACY = {
    "battlespotdoubles", "battlespotspecial7", "battlespottriples",
    "gen5doublesou", "gen5smogondoubles", "gen7battlespotdoubles",
    "gen7doublesanythinggoes", "gen7doublesanythinggoesbeta",
    "gen7doublesou", "gen7doublesoubeta", "gen7pokebankdoublesag",
    "gen7pokebankdoublesanythinggoes", "gen7pokebankdoublesou",
    "gen7pokebankdoublesoubeta", "gen7randomdoublesbattle", "gen7vgc2017",
    "gen7vgc2017beta", "gen7vgc2018", "gen7vgc2019", "gen8doublesou",
    "gen8doublesubers", "gen8doublesuu", "gen8vgc2020", "gen8vgc2021",
    "gen8vgc2022", "orassmogondoubles", "randomdoublesbattle",
    "randomtriplesbattle", "smogondoubles", "smogondoublessuspecttest",
    "smogondoublesubers", "smogondoublesuu", "smogontriples", "vgc2014",
    "vgc2015", "vgc2016", "vgc2017",
}
NON_6V6_FORMATS_LEGACY = {
    "battlespotdoubles", "battlespotsingles", "battlespotspecial7",
    "challengecup1v1", "gen5gbusingles", "gen71v1", "gen7alolafriendly",
    "gen7battlespotdoubles", "gen7battlespotsingles", "gen7challengecup1v1",
    "gen7vgc2017", "gen7vgc2017beta", "gen81v1", "gen8firstblood",
    "gen8tagteamsingles", "gen91v1", "pgllittlecup", "vgc2014", "vgc2015",
    "vgc2016", "vgc2017",
}

# stats/src/aliases.json (subset covering this slice): cosmetic formes and
# shorthand names fold to the base species before the dex lookup
# (util.ts:40-48).
ALIASES = {
    "gastrodoneast": "gastrodon",
    "genesectb": "genesect", "genesectburn": "genesect",
    "genesectc": "genesect", "genesectchill": "genesect",
    "genesectd": "genesect", "genesectdouse": "genesect",
    "genesects": "genesect", "genesectshock": "genesect",
    "keldeor": "keldeo", "keldeoresolute": "keldeo",
    "keldeoresolution": "keldeo",
    "aegislashblade": "aegislash",
    "castformrainy": "castform", "castformsnowy": "castform",
    "castformsunny": "castform",
    "ashgreninja": "greninjaash",
    "basculinbluestriped": "basculin",
}

LEGACY_DEX = register(GenDex(
    name="legacy",
    species=SPECIES, aliases=ALIASES, formes=FORMES,
    moves=MOVES, items=ITEMS, abilities=ABILITIES, natures=NATURES,
    mega_stones=MEGA_STONES, tables=CLASSIFIER_TABLES,
    trapping_abilities=TRAPPING_ABILITIES, trapping_moves=TRAPPING_MOVES,
    tag_trapping_moves=TAG_TRAPPING_MOVES, setup_abilities=SETUP_ABILITIES,
    greater_offensive_abilities=GREATER_OFFENSIVE_ABILITIES,
    lesser_offensive_abilities=LESSER_OFFENSIVE_ABILITIES,
    lesser_defensive_abilities=LESSER_DEFENSIVE_ABILITIES,
    greater_defensive_abilities=GREATER_DEFENSIVE_ABILITIES,
    lesser_boosting_items=LESSER_BOOSTING_ITEMS,
    greater_boosting_items=GREATER_BOOSTING_ITEMS,
    dragons=DRAGONS,
    non_singles_formats=NON_SINGLES_FORMATS_LEGACY,
    non_6v6_formats=NON_6V6_FORMATS_LEGACY,
    legacy=True,
))
