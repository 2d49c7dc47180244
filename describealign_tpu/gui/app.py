"""wxPython GUI: main frame, settings dialog, combiner frame.

Structure and behavior mirror the reference GUI (describealign.py:1177-1760):
- FrameMain: video/audio list controls with browse dialogs and drag-and-drop
  (folders expanded), delete-key removal, dark-mode recoloring (checkboxes
  skipped for screen-reader compatibility), input validation dialogs.
- DialogSettings: widget<->setting autowiring by widget class, tooltips as
  docs, stretch_audio gating no_pitch_correction, persisted to config.ini.
- FrameCombine: runs combine() in a daemon multiprocessing.Process with
  stdout/stderr redirected through a Queue; a 100 ms wx.Timer drains the
  queue into a read-only text ctrl; "\\r" lines overwrite the last line;
  "  WARNING:"/"  ERROR:" lines are colorized; closing confirms and
  terminates the worker.

This module requires wxPython; import it lazily (cli.py does).
"""
import io
import multiprocessing
import os
import traceback
from contextlib import redirect_stderr, redirect_stdout

import wx

from ..config import get_config_path, read_config_file, write_config_file
from ..constants import AUDIO_EXTENSIONS, VIDEO_EXTENSIONS

gui_font = (11, wx.FONTFAMILY_SWISS, wx.FONTSTYLE_NORMAL,
            wx.FONTWEIGHT_NORMAL, False, "Arial")
gui_update_interval_ms = 100
gui_background_color_dark = (28, 30, 35)
gui_background_color_light = (170, 182, 211)


def set_tooltip(element, tip):
    element.SetToolTip(tip)
    tooltip_object = element.GetToolTip()
    if tooltip_object is not None:
        tooltip_object.SetAutoPop(30000)  # keep tooltips up for 30 s


def get_children(window):
    children = list(window.GetChildren())
    sub = [g for child in children for g in get_children(child)]
    return children + sub


def set_background_color(window, is_dark):
    for child in get_children(window) + [window]:
        # recoloring a CheckBox turns it into a Button, which breaks
        # screen readers - skip them
        if isinstance(child, wx.CheckBox):
            continue
        if is_dark:
            if isinstance(child, (wx.ListCtrl, wx.TextCtrl)):
                child.SetBackgroundColour("Black")
            elif isinstance(child, wx.Button):
                child.SetBackgroundColour(
                    tuple(c // 2 for c in gui_background_color_dark))
            else:
                child.SetBackgroundColour(gui_background_color_dark)
        child.SetForegroundColour("White" if is_dark else "Black")


class QueueWriter(io.TextIOWrapper):
    def __init__(self, queue):
        super().__init__(buffer=io.BytesIO())
        self._queue = queue

    def write(self, s):
        self._queue.put(s)
        return len(s)


def combine_print_exceptions(print_queue, *args, **kwargs):
    from ..pipeline import combine
    writer = QueueWriter(print_queue)
    with redirect_stdout(writer), redirect_stderr(writer):
        try:
            combine(*args, **kwargs)
        except Exception:
            print("  ERROR: exception raised")
            traceback.print_exc()


class DialogSettings(wx.Dialog):
    def __init__(self, parent, config_path, is_dark):
        wx.Dialog.__init__(self, parent, title="Settings - describealign-tpu",
                           size=wx.Size(450, 370),
                           style=wx.DEFAULT_DIALOG_STYLE | wx.TAB_TRAVERSAL)
        self.SetFont(wx.Font(*gui_font))
        self.SetBackgroundColour(gui_background_color_dark if is_dark
                                 else gui_background_color_light)

        self.text_header = wx.StaticText(
            self, label="Check tooltips (i.e. mouse-over text) for descriptions:")

        box_output = wx.StaticBoxSizer(wx.VERTICAL, self, "output_dir")
        self.dir_picker_output = wx.DirPickerCtrl(
            self, message="Select a folder", name="output_dir")
        set_tooltip(self.dir_picker_output,
                    'Directory combined output media is saved to. '
                    'Default is "videos_with_ad"')
        box_alignment = wx.StaticBoxSizer(wx.VERTICAL, self, "alignment_dir")
        self.dir_picker_alignment = wx.DirPickerCtrl(
            self, message="Select a folder", name="alignment_dir")
        set_tooltip(self.dir_picker_alignment,
                    'Directory alignment data and plots are saved to. '
                    'Default is "alignment_plots"')

        self.text_prepend = wx.StaticText(self, label="prepend:")
        self.text_ctrl_prepend = wx.TextCtrl(self, name="prepend")
        set_tooltip(self.text_ctrl_prepend,
                    'Output file name prepend text. Default is "ad_"')

        panel_stretch = wx.Panel(self)
        self.checkbox_stretch_audio = wx.CheckBox(
            panel_stretch, label="stretch_audio", name="stretch_audio")
        set_tooltip(self.checkbox_stretch_audio,
                    'Stretches the input audio to fit the input video. '
                    'Default is to stretch the video to fit the audio. '
                    'Keeps original video audio as secondary tracks. Slower '
                    'and uses more RAM when enabled.')
        self.checkbox_stretch_audio.Bind(wx.EVT_CHECKBOX,
                                         self.update_stretch_audio_subsettings)
        self.checkbox_no_pitch_correction = wx.CheckBox(
            panel_stretch, label="no_pitch_correction",
            name="no_pitch_correction")
        set_tooltip(self.checkbox_no_pitch_correction,
                    'Skips pitch correction step when stretching audio. '
                    'Requires stretch_audio to be set, otherwise does nothing.')

        self.button_save = wx.Button(self, label="Save")
        self.button_save.Bind(wx.EVT_BUTTON, self.save_settings)
        self.button_cancel = wx.Button(self, label="Cancel")
        self.button_cancel.Bind(wx.EVT_BUTTON, lambda event: self.EndModal(0))

        sizer = wx.BoxSizer(wx.VERTICAL)
        self.SetSizer(sizer)
        sizer.Add(self.text_header, 0, wx.ALL, 5)
        row_out = wx.BoxSizer(wx.HORIZONTAL)
        row_out.Add(box_output, 1, wx.LEFT | wx.RIGHT | wx.ALIGN_CENTER_VERTICAL, 5)
        box_output.Add(self.dir_picker_output, 1, wx.EXPAND)
        sizer.Add(row_out, 3, wx.LEFT | wx.RIGHT | wx.EXPAND, 2)
        row_align = wx.BoxSizer(wx.HORIZONTAL)
        row_align.Add(box_alignment, 1, wx.LEFT | wx.RIGHT | wx.ALIGN_CENTER_VERTICAL, 5)
        box_alignment.Add(self.dir_picker_alignment, 1, wx.EXPAND)
        sizer.Add(row_align, 3, wx.LEFT | wx.RIGHT | wx.EXPAND, 2)
        row_prepend = wx.BoxSizer(wx.HORIZONTAL)
        row_prepend.Add(self.text_prepend, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        row_prepend.Add(self.text_ctrl_prepend, 0, wx.ALIGN_CENTER_VERTICAL, 5)
        sizer.Add(row_prepend, 3, wx.LEFT | wx.EXPAND, 5)
        inner = wx.BoxSizer(wx.VERTICAL)
        panel_stretch.SetSizer(inner)
        inner.Add(self.checkbox_stretch_audio, 0, wx.ALL, 5)
        inner.Add(self.checkbox_no_pitch_correction, 0, wx.ALL, 5)
        row_stretch = wx.BoxSizer(wx.HORIZONTAL)
        row_stretch.Add(panel_stretch, 1, wx.LEFT | wx.EXPAND, 5)
        row_stretch.Add((0, 0), 2, wx.EXPAND, 5)
        sizer.Add(row_stretch, 3, wx.LEFT | wx.EXPAND, 5)
        row_buttons = wx.BoxSizer(wx.HORIZONTAL)
        row_buttons.Add((0, 0), 3, wx.EXPAND, 5)
        row_buttons.Add(self.button_save, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        row_buttons.Add((0, 0), 2, wx.EXPAND, 5)
        row_buttons.Add(self.button_cancel, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        row_buttons.Add((0, 0), 3, wx.EXPAND, 5)
        sizer.Add(row_buttons, 5, wx.BOTTOM | wx.EXPAND, 5)
        self.Centre(wx.BOTH)

        # autowire settings to widgets by class name (reference 1312-1327)
        self.setting_getters = {}
        self.setting_setters = {}
        for child in list(self.GetChildren()) + list(panel_stretch.GetChildren()):
            cls = child.GetClassName()
            name = child.GetName()
            if cls == "wxDirPickerCtrl":
                self.setting_getters[name] = child.GetPath
                self.setting_setters[name] = child.SetPath
            if cls == "wxCheckBox":
                self.setting_getters[name] = child.GetValue
                self.setting_setters[name] = child.SetValue
            if cls == "wxTextCtrl":
                self.setting_getters[name] = child.GetValue
                self.setting_setters[name] = \
                    lambda value, child=child: child.SetValue(str(value))
        self.setting_names = self.setting_getters.keys()

        self.config_path = config_path
        settings = read_config_file(self.config_path)
        for name in self.setting_names:
            self.setting_setters[name](settings[name])
        self.update_stretch_audio_subsettings()
        set_background_color(self, is_dark)
        if sum(self.checkbox_stretch_audio.GetForegroundColour()[:3]) < 350:
            panel_stretch.SetBackgroundColour(gui_background_color_light)

    def update_stretch_audio_subsettings(self, event=None):
        if self.checkbox_stretch_audio.IsChecked():
            self.checkbox_no_pitch_correction.Enable()
        else:
            self.checkbox_no_pitch_correction.Disable()

    def save_settings(self, event):
        settings = {name: self.setting_getters[name]()
                    for name in self.setting_names}
        write_config_file(self.config_path, settings)
        self.EndModal(0)


class FrameCombine(wx.Frame):
    def __init__(self, parent, config_path, video_files, audio_files, is_dark):
        wx.Frame.__init__(self, parent, title="Combining - describealign-tpu",
                          size=wx.Size(800, 600))
        self.SetFont(wx.Font(*gui_font))
        self.SetBackgroundColour(gui_background_color_dark if is_dark
                                 else gui_background_color_light)
        self.panel0 = wx.Panel(self, style=wx.TAB_TRAVERSAL)
        self.text_ctrl_output = wx.TextCtrl(
            self.panel0, style=wx.TE_MULTILINE | wx.TE_READONLY | wx.TE_RICH)
        self.button_close = wx.Button(self.panel0, label="Close")
        self.button_close.Bind(wx.EVT_BUTTON, self.attempt_close)
        self.Bind(wx.EVT_CLOSE, self.attempt_close)
        self.update_timer = wx.Timer(self)
        self.Bind(wx.EVT_TIMER, self.update_gui, self.update_timer)

        outer = wx.BoxSizer(wx.VERTICAL)
        self.SetSizer(outer)
        outer.Add(self.panel0, 1, wx.EXPAND | wx.ALL, 5)
        inner = wx.BoxSizer(wx.VERTICAL)
        self.panel0.SetSizer(inner)
        inner.Add(self.text_ctrl_output, 1, wx.ALL | wx.EXPAND, 5)
        row = wx.BoxSizer(wx.HORIZONTAL)
        row.Add((0, 0), 1, wx.EXPAND, 5)
        row.Add(self.button_close, 0, wx.ALL, 5)
        row.Add((0, 0), 1, wx.EXPAND, 5)
        inner.Add(row, 0, wx.EXPAND, 5)
        self.Centre(wx.BOTH)
        set_background_color(self, is_dark)

        self.config_path = config_path
        self.overwrite_last_line = False
        self.display_line('Combining media files:')
        self.text_ctrl_output.SetInsertionPoint(0)

        # run combine() in a worker process; stream prints through a queue
        self.print_queue = multiprocessing.Queue()
        settings = read_config_file(self.config_path)
        settings.update({'yes': True})
        self.combine_process = multiprocessing.Process(
            target=combine_print_exceptions,
            args=(self.print_queue, video_files, audio_files),
            kwargs=settings, daemon=True)
        self.combine_process.start()
        self.update_gui()

    def attempt_close(self, event):
        if self.combine_process.is_alive():
            dialog = wx.MessageDialog(
                self, "Warning: combiner is still running, stop it and close "
                      "anyway?", "Warning", wx.YES_NO | wx.ICON_WARNING)
            response = dialog.ShowModal()
            if response == wx.ID_YES:
                self.combine_process.terminate()
                self.Destroy()
            elif response == wx.ID_NO:
                if event.GetEventType() == wx.EVT_CLOSE.evtType[0]:
                    event.Veto(True)
        else:
            self.Destroy()

    def set_last_line_color(self, color, line_start):
        end = self.text_ctrl_output.GetLastPosition()
        self.text_ctrl_output.SetStyle(line_start, end,
                                       wx.TextAttr("black", color))

    def display_line(self, line):
        if self.overwrite_last_line:
            if line == "":
                return  # skip the empty line following a "\r" line
            num_lines = self.text_ctrl_output.GetNumberOfLines()
            start = self.text_ctrl_output.XYToPosition(0, num_lines - 2)
            end = self.text_ctrl_output.GetLastPosition()
            self.text_ctrl_output.Remove(start, end)
            self.overwrite_last_line = False
        if line[-1:] == "\r":
            self.overwrite_last_line = True
            line = line[:-1].rstrip(' ') + "\r"
        line_start = self.text_ctrl_output.GetLastPosition()
        self.text_ctrl_output.AppendText(line)
        if line[:10] == "  WARNING:":
            self.set_last_line_color(wx.Colour(255, 188, 64), line_start)
        if line[:8] == "  ERROR:":
            self.set_last_line_color(wx.Colour(255, 128, 128), line_start)

    def update_gui(self, event=None):
        lines = []
        while not self.print_queue.empty():
            lines.append(self.print_queue.get())
        if lines:
            cursor = self.text_ctrl_output.GetInsertionPoint()
            self.text_ctrl_output.Freeze()
            for line in lines:
                self.display_line(line)
            self.text_ctrl_output.SetInsertionPoint(cursor)
            self.text_ctrl_output.Thaw()
        self.update_timer.StartOnce(gui_update_interval_ms)


class ListCtrlDropTarget(wx.FileDropTarget):
    def __init__(self, list_ctrl, parent_frame):
        super().__init__()
        self.list_ctrl = list_ctrl
        self.parent_frame = parent_frame

    def expand_folders(self, files):
        expanded = []
        for f in files:
            if os.path.isdir(f):
                for dirpath, _, dir_files in os.walk(f):
                    expanded.extend(os.path.join(dirpath, df)
                                    for df in dir_files)
            else:
                expanded.append(f)
        return expanded

    def OnDropFiles(self, x, y, files):
        from ..utils.sorting import os_sorted
        files = self.expand_folders(files)
        valid = self.parent_frame.list_ctrl_file_types_drop[self.list_ctrl]
        files = [f for f in files if os.path.splitext(f)[-1][1:] in valid]
        self.parent_frame.populate_list_ctrl(self.list_ctrl, os_sorted(files))
        return True


class FrameMain(wx.Frame):
    def __init__(self, parent):
        from .. import __version__
        wx.Frame.__init__(self, parent,
                          title=f"describealign-tpu v{__version__}",
                          size=wx.Size(800, 500))
        self.SetFont(wx.Font(*gui_font))
        appearance = wx.SystemSettings.GetAppearance()
        self.is_dark = appearance.IsDark() or appearance.IsUsingDarkBackground()
        self.SetBackgroundColour(gui_background_color_dark if self.is_dark
                                 else gui_background_color_light)
        self.panel0 = wx.Panel(self, style=wx.TAB_TRAVERSAL)

        self.text_header = wx.StaticText(self.panel0,
                                         label="Select media files to combine:")
        self.text_header.SetFont(self.text_header.GetFont().Scale(1.7))

        box_video = wx.StaticBoxSizer(wx.HORIZONTAL, self.panel0, "Video Input")
        self.list_ctrl_video = self.init_list_ctrl(
            box_video.GetStaticBox(),
            "Drag and Drop Videos Here or Press Browse Video")
        set_tooltip(self.list_ctrl_video,
                    "Video filenames are listed here in the sorted order they "
                    "will be used as input. Drag and Drop or press Browse to "
                    "overwrite.")
        self.button_browse_video = wx.Button(box_video.GetStaticBox(),
                                             label="Browse Video")
        set_tooltip(self.button_browse_video,
                    "Select one or more video files as input.")
        self.button_browse_video.Bind(
            wx.EVT_BUTTON, lambda e: self.browse_files(self.list_ctrl_video))

        box_audio = wx.StaticBoxSizer(wx.HORIZONTAL, self.panel0, "Audio Input")
        self.list_ctrl_audio = self.init_list_ctrl(
            box_audio.GetStaticBox(),
            "Drag and Drop Audio Here or Press Browse Audio")
        set_tooltip(self.list_ctrl_audio,
                    "Audio filenames are listed here in the sorted order they "
                    "will be used as input. Drag and Drop or press Browse to "
                    "overwrite.")
        self.button_browse_audio = wx.Button(box_audio.GetStaticBox(),
                                             label="Browse Audio")
        set_tooltip(self.button_browse_audio,
                    "Select one or more audio files as input.")
        self.button_browse_audio.Bind(
            wx.EVT_BUTTON, lambda e: self.browse_files(self.list_ctrl_audio))

        self.button_combine = wx.Button(self.panel0, label="Combine")
        set_tooltip(self.button_combine,
                    "Combine selected video and audio files.")
        self.button_combine.Bind(wx.EVT_BUTTON, self.open_combine)
        self.button_settings = wx.Button(self.panel0, label="Settings")
        set_tooltip(self.button_settings,
                    "Edit settings for the GUI and algorithm.")
        self.button_settings.Bind(wx.EVT_BUTTON, self.open_settings)

        outer = wx.BoxSizer(wx.VERTICAL)
        self.SetSizer(outer)
        outer.Add(self.panel0, 1, wx.EXPAND | wx.ALL, 5)
        inner = wx.BoxSizer(wx.VERTICAL)
        self.panel0.SetSizer(inner)
        header = wx.BoxSizer(wx.HORIZONTAL)
        header.Add(self.text_header, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        inner.Add(header, 3, wx.EXPAND, 5)
        row_video = wx.BoxSizer(wx.HORIZONTAL)
        row_video.Add(box_video, 1, wx.LEFT | wx.RIGHT | wx.EXPAND, 3)
        box_video.Add(self.list_ctrl_video, 1, wx.BOTTOM | wx.EXPAND, 2)
        box_video.Add(self.button_browse_video, 0,
                      wx.LEFT | wx.BOTTOM | wx.RIGHT | wx.ALIGN_CENTER_VERTICAL, 10)
        inner.Add(row_video, 9, wx.EXPAND, 5)
        row_audio = wx.BoxSizer(wx.HORIZONTAL)
        row_audio.Add(box_audio, 1, wx.LEFT | wx.RIGHT | wx.EXPAND, 3)
        box_audio.Add(self.list_ctrl_audio, 1, wx.BOTTOM | wx.EXPAND, 2)
        box_audio.Add(self.button_browse_audio, 0,
                      wx.LEFT | wx.BOTTOM | wx.RIGHT | wx.ALIGN_CENTER_VERTICAL, 10)
        inner.Add(row_audio, 9, wx.TOP | wx.EXPAND, 3)
        row_buttons = wx.BoxSizer(wx.HORIZONTAL)
        row_buttons.Add((0, 0), 7, wx.EXPAND, 5)
        row_buttons.Add(self.button_combine, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        row_buttons.Add((0, 0), 2, wx.EXPAND, 5)
        row_buttons.Add(self.button_settings, 0, wx.ALL | wx.ALIGN_CENTER_VERTICAL, 5)
        row_buttons.Add((0, 0), 7, wx.EXPAND, 5)
        inner.Add(row_buttons, 3, wx.EXPAND, 5)
        self.Centre(wx.BOTH)

        def types_string(pairs):
            return '|'.join(f'{name} ({pat})|{pat}' for name, pat in pairs)

        all_video = [('All Video File Types',
                      '*.' + ';*.'.join(VIDEO_EXTENSIONS))]
        all_audio = [('All Audio File Types',
                      '*.' + ';*.'.join(AUDIO_EXTENSIONS))]
        all_both = [('All Video and Audio File Types',
                     '*.' + ';*.'.join(VIDEO_EXTENSIONS | AUDIO_EXTENSIONS))]
        video_types = [(ext, f"*.{ext}") for ext in VIDEO_EXTENSIONS]
        audio_types = [(ext, f"*.{ext}") for ext in AUDIO_EXTENSIONS]
        self.list_ctrl_file_types_browse = {
            self.list_ctrl_video: types_string(all_video + all_both
                                               + video_types + audio_types),
            self.list_ctrl_audio: types_string(all_audio + audio_types),
        }
        self.list_ctrl_file_types_drop = {
            self.list_ctrl_video: VIDEO_EXTENSIONS,
            self.list_ctrl_audio: AUDIO_EXTENSIONS,
        }
        self.list_ctrl_files_selected = {self.list_ctrl_video: [],
                                         self.list_ctrl_audio: []}
        self.config_path = get_config_path()
        set_background_color(self, self.is_dark)

    def init_list_ctrl(self, parent_panel, default_text):
        list_ctrl = wx.ListCtrl(parent_panel,
                                style=wx.LC_NO_HEADER | wx.LC_REPORT
                                | wx.BORDER_SUNKEN | wx.HSCROLL)
        list_ctrl.EnableSystemTheme(False)  # no vertical grid lines on Windows
        list_ctrl.SetMinSize(wx.Size(-1, 80))
        list_ctrl.SetDropTarget(ListCtrlDropTarget(list_ctrl, self))
        list_ctrl.InsertColumn(0, "")
        list_ctrl.InsertItem(0, default_text)
        list_ctrl.SetColumnWidth(0, wx.LIST_AUTOSIZE)
        list_ctrl.Bind(wx.EVT_CHAR, self.delete_from_list_ctrl)
        return list_ctrl

    def populate_list_ctrl(self, list_ctrl, files):
        self.list_ctrl_files_selected[list_ctrl] = files
        if len(files) == 0:
            files = ["No files with valid file types found"]
        list_ctrl.DeleteAllItems()
        list_ctrl.DeleteAllColumns()
        list_ctrl.InsertColumn(0, "")
        for i, f in enumerate(files):
            list_ctrl.InsertItem(i, os.path.basename(f))
        list_ctrl.SetColumnWidth(0, wx.LIST_AUTOSIZE)

    def browse_files(self, list_ctrl):
        dialog = wx.FileDialog(
            self, wildcard=self.list_ctrl_file_types_browse[list_ctrl],
            style=wx.FD_MULTIPLE)
        if dialog.ShowModal() == wx.ID_OK:
            self.populate_list_ctrl(list_ctrl, dialog.GetPaths())

    def delete_from_list_ctrl(self, event):
        if event.GetKeyCode() == wx.WXK_DELETE:
            list_ctrl = event.GetEventObject()
            idx = list_ctrl.GetFirstSelected()
            if idx == -1:
                idx = list_ctrl.GetFocusedItem()
            to_delete = []
            while idx != -1:
                to_delete.append(idx)
                idx = list_ctrl.GetNextSelected(idx)
            for idx in to_delete[::-1]:
                if self.list_ctrl_files_selected[list_ctrl]:
                    list_ctrl.DeleteItem(idx)
                    del self.list_ctrl_files_selected[list_ctrl][idx]
        else:
            event.Skip()

    def open_combine(self, event):
        video_files = self.list_ctrl_files_selected[self.list_ctrl_video]
        audio_files = self.list_ctrl_files_selected[self.list_ctrl_audio]
        if len(video_files) == 0:
            wx.MessageDialog(self, "Error: no video input selected.", "Error",
                             wx.OK | wx.ICON_ERROR).ShowModal()
        elif len(audio_files) == 0:
            wx.MessageDialog(self, "Error: no audio input selected.", "Error",
                             wx.OK | wx.ICON_ERROR).ShowModal()
        elif len(video_files) != len(audio_files):
            wx.MessageDialog(
                self, f"Error: different numbers of video ({len(video_files)})"
                      f" and audio ({len(audio_files)}) inputs.",
                "Error", wx.OK | wx.ICON_ERROR).ShowModal()
        else:
            frame = FrameCombine(None, self.config_path, video_files,
                                 audio_files, self.is_dark)
            self.list_ctrl_video.SetFocus()
            frame.Show()

    def open_settings(self, event):
        dialog = DialogSettings(None, self.config_path, self.is_dark)
        dialog.ShowModal()
        dialog.Destroy()


def run_gui():
    import platform
    if platform.system() == 'Darwin':
        # macOS file dialog needs this to show file types correctly
        wx.SystemOptions.SetOption('osx.openfiledialog.always-show-types', 1)
    app = wx.App()
    main = FrameMain(None)
    main.Show()
    app.MainLoop()
